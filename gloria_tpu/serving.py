"""Production inference serving: shape-bucketed, dynamically-batched zero-shot.

The reference is research scripts only — its zero-shot path re-runs the
image tower once per class and recompiles on every new batch size
(``/root/reference/gloria/gloria.py:184-275``).  This module is the
deployment path the reference lacks, designed around XLA's compilation
model:

- **Shape buckets.** XLA compiles one executable per input shape; ad-hoc
  request sizes would each pay a multi-second compile.  Every image batch
  is padded to the next power-of-two bucket (≤ ``max_batch``) so at most
  ``log2(max_batch)+1`` executables ever exist, and ``warmup()`` builds
  them ahead of traffic.
- **Encode once, score per class.** Class prompts are tokenized and
  encoded ONCE at ``set_classes``; each request runs the image tower once
  and reuses the cached text embeddings for every class (the reference
  re-encodes the images per class).  The local-similarity scoring
  auto-routes through the fused Pallas kernel on TPU (``api.py``).
- **Dynamic batching.** ``DynamicBatcher`` coalesces concurrent requests
  up to ``max_batch`` or ``max_wait_ms`` and resolves
  ``concurrent.futures.Future``s, so many small callers share one padded
  device program.
- **Stdlib HTTP front end.** ``serve_http`` exposes ``POST /classify``
  (JSON ``{"paths": [...]}`` or base64 ``{"arrays_b64": ...}``),
  ``GET /healthz``, and ``GET /stats`` (uptime, per-endpoint request/error
  counts, latency percentiles, queue depth) on ``http.server`` — no web
  framework dependency.
"""

from __future__ import annotations

import base64
import io
import json
import queue
import threading
import time
from collections import Counter, deque
from concurrent.futures import Future
from pathlib import Path
from typing import Sequence

import numpy as np

from .api import GloriaModel, generate_chexpert_class_prompts


class ServingStats:
    """Thread-safe request accounting for the ``/stats`` endpoint.

    Latencies keep a bounded window (last ``window`` samples per endpoint)
    so a long-lived server reports *recent* percentiles, not lifetime ones,
    at O(1) memory."""

    def __init__(self, window: int = 2048):
        self._lock = threading.Lock()
        self._window = window
        self.started = time.time()
        self.requests: Counter = Counter()
        self.errors: Counter = Counter()
        self.images = 0
        self._latency: dict[str, deque] = {}

    def record(self, endpoint: str, seconds: float, images: int = 0,
               error: bool = False) -> None:
        with self._lock:
            self.requests[endpoint] += 1
            self.images += images
            if error:
                self.errors[endpoint] += 1
            else:  # errors fail fast; mixing them in would skew the tail
                self._latency.setdefault(
                    endpoint, deque(maxlen=self._window)).append(seconds)

    def snapshot(self) -> dict:
        with self._lock:
            latency = {}
            for ep, window in self._latency.items():
                ms = np.asarray(window, np.float64) * 1e3
                latency[ep] = {
                    "n": int(ms.size),
                    "p50_ms": round(float(np.percentile(ms, 50)), 3),
                    "p90_ms": round(float(np.percentile(ms, 90)), 3),
                    "p99_ms": round(float(np.percentile(ms, 99)), 3),
                    "max_ms": round(float(ms.max()), 3),
                }
            return {
                "uptime_s": round(time.time() - self.started, 3),
                "requests": dict(self.requests),
                "errors": dict(self.errors),
                "images": self.images,
                "latency": latency,
            }


def _next_bucket(n: int, max_batch: int) -> int:
    b = 1
    while b < n and b < max_batch:
        b *= 2
    return min(b, max_batch)


class InferenceEngine:
    """Zero-shot / similarity scoring over a loaded :class:`GloriaModel`."""

    def __init__(self, model: GloriaModel, classes: dict | None = None,
                 max_batch: int = 64):
        import jax
        import jax.numpy as jnp

        from .data.transforms import norm_constants

        self.model = model
        self.max_batch = max_batch
        self._jax = jax
        gloria = model.model

        t = model.cfg.transforms or None
        m, s = norm_constants(t.norm if t else None)
        mean = jnp.asarray(m, jnp.float32)
        std = jnp.asarray(s, jnp.float32)

        def img_fwd(variables, imgs):
            if imgs.dtype == jnp.uint8:
                # device-side ToTensor+Normalize: clients ship uint8 (4× less
                # host→device traffic — the dominant serving cost over
                # PCIe/tunnel links; the device does the cheap arithmetic)
                imgs = (imgs.astype(jnp.float32) / 255.0 - mean) / std
            emb_l, emb_g, _ = gloria.apply(
                variables, imgs, train=False,
                method=type(gloria).image_encoder_forward)
            return emb_l, emb_g

        self._img_fwd = jax.jit(img_fwd)
        self._class_names: list[str] = []
        if classes is not None:
            self.set_classes(classes)

    # -- class prompt cache --------------------------------------------------
    def set_classes(self, cls_txt_mapping: dict) -> None:
        """Tokenize + encode each class's prompts once and build ONE jitted
        scoring program over the stacked prompt set; per-request work is then
        the image tower + a single device program for all classes."""
        import jax
        import jax.numpy as jnp

        from .configs import Config
        from .ops import gloria_loss

        gloria = self.model.model
        stacked_l, stacked_g, stacked_caps, class_ids = [], [], [], []
        for ci, (name, prompts) in enumerate(cls_txt_mapping.items()):
            txt = self.model.process_text(list(prompts))
            txt_l, txt_g = gloria.apply(
                self.model.variables,
                jnp.asarray(txt["caption_ids"]), jnp.asarray(txt["attention_mask"]),
                jnp.asarray(txt["token_type_ids"]), jnp.asarray(txt["word_assignment"]),
                method=type(gloria).text_encoder_forward)
            stacked_l.append(txt_l)
            stacked_g.append(txt_g)
            stacked_caps.append(np.asarray(txt["cap_lens"]))
            class_ids.extend([ci] * txt_l.shape[0])
        self._class_names = list(cls_txt_mapping.keys())
        self._txt_l = jnp.concatenate(stacked_l)
        self._txt_g = jnp.concatenate(stacked_g)
        self._caps = jnp.asarray(np.concatenate(stacked_caps))
        n_classes = len(cls_txt_mapping)
        # [P_total, C] one-hot; per-class max becomes a masked reduce (static
        # shapes — XLA-friendly, no gather loops)
        onehot = np.zeros((len(class_ids), n_classes), np.float32)
        onehot[np.arange(len(class_ids)), class_ids] = 1.0
        self._class_onehot = jnp.asarray(onehot)

        g = (self.model.cfg.model.gloria if self.model.cfg.model else None) or Config()
        use_fused = (gloria_loss.fused_eval_default() if g.fused_kernel is None
                     else bool(g.fused_kernel))
        if self.model.mesh is not None:
            use_fused = False  # pallas_call has no GSPMD rule; XLA path shards
        sink_name = "no_attn_vec"

        def score(variables, img_l, img_g, txt_l, txt_g, caps, onehot):
            local = gloria_loss.local_similarities_eval(
                img_l, txt_l, caps, temp1=4.0, temp2=5.0,
                sink=variables["params"].get(sink_name), use_fused=use_fused)
            glob = gloria_loss.global_similarities(img_g, txt_g)
            sims = (local + glob) / 2.0  # [B, P_total]
            # max over each class's prompts: mask out other classes with -inf
            masked = sims[:, :, None] + jnp.where(onehot[None] > 0, 0.0, -jnp.inf)
            return jnp.max(masked, axis=1)  # [B, C]

        self._score = jax.jit(score)

    @property
    def class_names(self) -> list[str]:
        return list(self._class_names)

    # -- retrieval corpus ----------------------------------------------------
    def set_corpus(self, targets: list, target_classes: list | None = None,
                   top_k: int = 5) -> None:
        """Embed an image→report retrieval corpus once (reference
        ``Retriver`` semantics via :class:`models.retrieval_model.Retriever`)."""
        from .models.retrieval_model import Retriever

        self._retriever = Retriever(self.model, list(targets),
                                    target_classes=target_classes, top_k=top_k)

    def retrieve(self, images, similarity_type: str = "both") -> list[dict]:
        """Per query image: top-k corpus reports (and classes when known).
        The whole query batch is encoded once and scored against the corpus
        in one pairwise program."""
        if getattr(self, "_retriever", None) is None:
            raise RuntimeError("no corpus set — call set_corpus() first")
        if isinstance(images, (str, Path, np.ndarray)):
            images = [images]
        imgs = np.asarray(self.model.process_img(list(images)))
        img_l, img_g = self.encode_images(imgs)
        out = []
        for targets, classes in self._retriever.retrieve_embedded(img_l, img_g, similarity_type):
            out.append({"targets": [str(t) for t in targets],
                        "classes": None if classes is None
                        else [c.item() if hasattr(c, "item") else c for c in classes]})
        return out

    # -- device programs -----------------------------------------------------
    def _bucket(self, n: int) -> int:
        """Padded batch size: power-of-2 bucket, rounded up to a multiple of
        the mesh's data axis when the model is sharded (so the image tower
        splits evenly over devices)."""
        b = _next_bucket(n, self.max_batch)
        if self.model.mesh is not None:
            nd = self.model.mesh.shape["data"]
            b = -(-b // nd) * nd
        return b

    def _put(self, imgs):
        """Place a padded batch: split over the mesh's 'data' axis when the
        model was sharded via :meth:`GloriaModel.shard`, else default device."""
        import jax.numpy as jnp

        if self.model.mesh is not None:
            from .parallel.mesh import batch_sharding

            return self._jax.device_put(jnp.asarray(imgs),
                                        batch_sharding(self.model.mesh))
        return jnp.asarray(imgs)

    def encode_images(self, imgs: np.ndarray):
        """[B, H, W, 3] float32 → (img_emb_l [B, R, D], img_emb_g [B, D]),
        padded to the bucket on device and stripped on return."""
        import jax.numpy as jnp

        n = imgs.shape[0]
        if n > self.max_batch:
            parts = [self.encode_images(imgs[i : i + self.max_batch])
                     for i in range(0, n, self.max_batch)]
            return (jnp.concatenate([p[0] for p in parts]),
                    jnp.concatenate([p[1] for p in parts]))
        bucket = self._bucket(n)
        if bucket != n:
            imgs = np.concatenate(
                [imgs, np.zeros((bucket - n,) + imgs.shape[1:], imgs.dtype)])
        emb_l, emb_g = self._img_fwd(self.model.variables, self._put(imgs))
        return emb_l[:n], emb_g[:n]

    def warmup(self, imsize: int | None = None, float32: bool = False) -> None:
        """Compile every bucket ahead of traffic.

        Warms the uint8 ingest path (the recommended client path: 4× smaller
        transfers, device-side normalize).  Pass ``float32=True`` to ALSO
        pre-compile each bucket for float inputs (e.g. arrays preprocessed by
        ``api.process_img``) — otherwise a float client pays one cold compile
        per bucket on first contact."""
        if imsize is None:
            data = self.model.cfg.data
            imsize = int(data.image.imsize or 256) if data and data.image else 256
            crop = (self.model.cfg.transforms.random_crop.crop_size
                    if self.model.cfg.transforms and self.model.cfg.transforms.random_crop
                    else None)
            imsize = int(crop or imsize)
        sizes = []
        b = 1
        while b < self.max_batch:
            sizes.append(b)
            b *= 2
        sizes.append(self.max_batch)  # the cap is a bucket even if not pow2
        for b in sizes:
            for dtype in (np.uint8,) + ((np.float32,) if float32 else ()):
                x = np.zeros((b, imsize, imsize, 3), dtype)
                if self._class_names:
                    self.classify(x)  # warms the image tower AND the scorer
                else:
                    self.encode_images(x)

    # -- scoring -------------------------------------------------------------
    def classify(self, imgs: np.ndarray, z_normalize: bool = False) -> np.ndarray:
        """[B, H, W, 3] processed images → [B, C] class scores
        (max-over-prompts mean(local, global) similarity, reference
        ``zero_shot_classification`` semantics; z-norm across the batch is
        opt-in — it is degenerate for single-image requests).

        Both the image tower and the scoring program run on the padded
        bucket so each bucket size compiles exactly once."""
        import jax.numpy as jnp

        if not self._class_names:
            raise RuntimeError("no classes set — call set_classes() first")
        n = imgs.shape[0]
        if n > self.max_batch:
            arr = np.concatenate(
                [self.classify(imgs[i : i + self.max_batch])
                 for i in range(0, n, self.max_batch)])
        else:
            bucket = self._bucket(n)
            if bucket != n:
                imgs = np.concatenate(
                    [imgs, np.zeros((bucket - n,) + imgs.shape[1:], imgs.dtype)])
            img_l, img_g = self._img_fwd(self.model.variables, self._put(imgs))
            arr = np.asarray(self._score(
                self.model.variables, img_l, img_g,
                self._txt_l, self._txt_g, self._caps, self._class_onehot))[:n]
        if z_normalize and arr.shape[0] > 1:
            arr = (arr - arr.mean(axis=0)) / arr.std(axis=0)
        return arr

    def process_img_uint8(self, paths_or_arrays) -> np.ndarray:
        """Host letterbox + crop, kept uint8 — ToTensor+Normalize happens on
        device (`img_fwd`), so the host→device transfer is 4× smaller than
        the f32 `api.process_img` pipeline.  Numerically identical: the
        device applies the same (x/255 − mean)/σ in f32."""
        import cv2

        from .data.transforms import center_crop, letterbox_resize, to_rgb

        cfg = self.model.cfg
        imsize = int(cfg.data.image.imsize or 256) if cfg.data and cfg.data.image else 256
        crop = (int(cfg.transforms.random_crop.crop_size)
                if cfg.transforms and cfg.transforms.random_crop else None)
        if isinstance(paths_or_arrays, (str, Path, np.ndarray)):
            paths_or_arrays = [paths_or_arrays]
        out = []
        for p in paths_or_arrays:
            x = cv2.imread(str(p), 0) if isinstance(p, (str, Path)) else np.asarray(p)
            x = to_rgb(letterbox_resize(x, imsize))
            if crop and crop != imsize:
                x = center_crop(x, crop)
            out.append(x)
        return np.stack(out).astype(np.uint8)

    def classify_paths(self, paths: Sequence[str], **kw) -> np.ndarray:
        return self.classify(self.process_img_uint8(list(paths)), **kw)


class DynamicBatcher:
    """Coalesces concurrent single/short requests into bucket-sized device
    batches; callers receive Futures of their per-image score rows."""

    def __init__(self, engine: InferenceEngine, max_wait_ms: float = 5.0):
        self.engine = engine
        self.max_wait = max_wait_ms / 1000.0
        self._q: queue.Queue = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def submit(self, imgs: np.ndarray) -> Future:
        """imgs [N, H, W, 3] → Future resolving to [N, C] scores."""
        if self._stop.is_set():
            raise RuntimeError("DynamicBatcher is closed")
        fut: Future = Future()
        self._q.put((np.asarray(imgs), fut))
        return fut

    def close(self) -> None:
        self._stop.set()
        self._thread.join(timeout=5)
        # fail any requests still queued rather than stranding their callers
        while True:
            try:
                _, fut = self._q.get_nowait()
            except queue.Empty:
                break
            if not fut.done():
                fut.set_exception(RuntimeError("DynamicBatcher closed"))

    def _worker(self) -> None:
        held = None  # shape/dtype-incompatible request deferred from the
        # previous round; it starts the next batch so an early arrival is
        # never served after later ones (re-enqueueing put it behind them)
        while not self._stop.is_set():
            if held is not None:
                first, held = held, None
            else:
                try:
                    first = self._q.get(timeout=0.05)
                except queue.Empty:
                    continue
            batch = [first]
            # only coalesce compatible requests: one device program needs one
            # dtype and one per-image shape (mixing would also silently
            # promote uint8 → f32 and skip the device-side normalization)
            key = (first[0].shape[1:], first[0].dtype)
            total = first[0].shape[0]
            deadline = threading.Event()
            t = threading.Timer(self.max_wait, deadline.set)
            t.start()
            while total < self.engine.max_batch and not deadline.is_set():
                try:
                    item = self._q.get(timeout=self.max_wait / 4)
                except queue.Empty:
                    continue
                if (item[0].shape[1:], item[0].dtype) == key:
                    batch.append(item)
                    total += item[0].shape[0]
                else:
                    held = item  # different program — it STARTS the next round
                    break
            t.cancel()
            try:
                imgs = np.concatenate([b[0] for b in batch])
                scores = self.engine.classify(imgs)
                off = 0
                for arr, fut in batch:
                    fut.set_result(scores[off : off + arr.shape[0]])
                    off += arr.shape[0]
            except Exception as e:  # propagate to callers, keep the worker alive
                for _, fut in batch:
                    if not fut.done():
                        fut.set_exception(e)
        if held is not None and not held[1].done():
            # fail it directly: close() may have already drained the queue
            # (its join times out while this thread sits in a cold compile),
            # so re-enqueueing could strand the future forever
            held[1].set_exception(RuntimeError("DynamicBatcher closed"))


# -- stdlib HTTP front end ----------------------------------------------------

def serve_http(engine: InferenceEngine, host: str = "127.0.0.1", port: int = 8000,
               batcher: DynamicBatcher | None = None,
               paths_root: str | None = None):
    """ThreadingHTTPServer with POST /classify and GET /healthz.  Returns the
    (started) server; call ``.shutdown()`` to stop.  Request JSON:
    ``{"paths": [...]}`` (host-readable files) or
    ``{"arrays_b64": "<base64 .npy of [N, H, W] uint8>"}``.

    ``paths`` requests read files as the server process — an arbitrary-path
    read primitive if exposed beyond trusted callers.  When ``paths_root``
    is set every path must resolve under it (403 otherwise); when unset,
    ``paths`` is accepted only from loopback clients and remote callers must
    send pixel data via ``arrays_b64``."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    bat = batcher
    root = str(Path(paths_root).resolve()) if paths_root else None
    stats = ServingStats()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"ok": True, "classes": engine.class_names})
            elif self.path == "/stats":
                payload = stats.snapshot()
                payload["max_batch"] = engine.max_batch
                if bat is not None:
                    payload["batcher_queue_depth"] = bat._q.qsize()
                self._json(200, payload)
            else:
                self._json(404, {"error": "unknown path"})

        def _inputs(self, req):
            """Request JSON → (raw inputs, error-response-or-None)."""
            if "paths" in req:
                paths = [str(p) for p in req["paths"]]
                if root is not None:
                    resolved = [str(Path(p).resolve()) for p in paths]
                    if not all(r == root or r.startswith(root + "/")
                               for r in resolved):
                        return None, (403, {"error": "path outside --paths-root"})
                    paths = resolved
                elif self.client_address[0] not in ("127.0.0.1", "::1"):
                    return None, (403, {"error": "'paths' is loopback-only without "
                                                 "paths_root; send 'arrays_b64'"})
                return paths, None
            if "arrays_b64" in req:
                raw = np.load(io.BytesIO(base64.b64decode(req["arrays_b64"])),
                              allow_pickle=False)
                return list(raw), None
            return None, (400, {"error": "need 'paths' or 'arrays_b64'"})

        def do_POST(self):
            if self.path not in ("/classify", "/retrieve"):
                return self._json(404, {"error": "unknown path"})
            t0 = time.perf_counter()
            n_inputs = 0
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                inputs, err = self._inputs(req)
                if err is not None:
                    stats.record(self.path, time.perf_counter() - t0, error=True)
                    return self._json(*err)
                n_inputs = len(inputs)
                if self.path == "/retrieve":
                    results = engine.retrieve(
                        inputs, similarity_type=req.get("similarity_type", "both"))
                    stats.record(self.path, time.perf_counter() - t0, n_inputs)
                    return self._json(200, {"results": results})
                imgs = engine.process_img_uint8(inputs)
                if bat is not None:
                    scores = bat.submit(imgs).result(timeout=60)
                else:
                    scores = engine.classify(imgs)
                stats.record(self.path, time.perf_counter() - t0, n_inputs)
                self._json(200, {"classes": engine.class_names,
                                 "scores": np.asarray(scores).tolist()})
            except Exception as e:
                stats.record(self.path, time.perf_counter() - t0, n_inputs, error=True)
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

    server = ThreadingHTTPServer((host, port), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server


def main(argv=None) -> int:
    import argparse

    from .api import load_gloria

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--ckpt", required=True, help="torch .ckpt or orbax dir")
    ap.add_argument("--classes-json", default=None,
                    help="JSON file {class: [prompts]}; default: CheXpert grammar")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--max-batch", type=int, default=64)
    ap.add_argument("--max-wait-ms", type=float, default=5.0)
    ap.add_argument("--no-warmup", action="store_true")
    ap.add_argument("--paths-root", default=None,
                    help="restrict 'paths' requests to files under this dir "
                         "(without it, 'paths' is loopback-only)")
    ap.add_argument("--corpus-json", default=None,
                    help='retrieval corpus for /retrieve: JSON '
                         '{"targets": [...], "classes": [...]?, "top_k": 5?}')
    ap.add_argument("--devices", type=int, default=None,
                    help="shard serving over an N-device mesh (batch over "
                         "'data', params per the TP/FSDP rules)")
    ap.add_argument("--fsdp", type=int, default=1)
    ap.add_argument("--tp", type=int, default=1)
    args = ap.parse_args(argv)

    model = load_gloria(args.ckpt)
    if args.devices:
        from .parallel.mesh import create_mesh

        model.shard(create_mesh(n_devices=args.devices, fsdp=args.fsdp, tp=args.tp))
    if args.classes_json:
        with open(args.classes_json) as fh:
            classes = json.load(fh)
    else:
        classes = generate_chexpert_class_prompts()
    engine = InferenceEngine(model, classes, max_batch=args.max_batch)
    if args.corpus_json:
        with open(args.corpus_json) as fh:
            corpus = json.load(fh)
        engine.set_corpus(corpus["targets"], corpus.get("classes"),
                          top_k=int(corpus.get("top_k", 5)))
    if not args.no_warmup:
        engine.warmup()
    batcher = DynamicBatcher(engine, max_wait_ms=args.max_wait_ms)
    server = serve_http(engine, args.host, args.port, batcher=batcher,
                        paths_root=args.paths_root)
    print(f"serving on http://{args.host}:{args.port} "
          f"(classes: {', '.join(engine.class_names)})", flush=True)
    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        server.shutdown()
        batcher.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
