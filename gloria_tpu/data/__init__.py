"""Host data plane: transforms, tokenization, datasets, collation, loading."""

from .collate import GloriaCollate, device_batch
from .loader import PrefetchLoader
from .pretraining_dataset import CheXpertPretrainingDataset, SyntheticPretrainingDataset, iterate_batches
from .synthetic import make_synthetic_batch
from .tokenizer import TextProcessor, WordPieceTokenizer, clean_report, load_tokenizer
from .transforms import build_transformation, letterbox_resize
