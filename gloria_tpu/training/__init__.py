from . import optim, train
from .train import TrainState, create_train_state, make_forward, make_pretrain_steps
