"""Segmentation serving daemon: dynamic batching over the SegServer fast path.

A minimal production-style server around the fixed-shape serving forward
(`eval/serving.py`): all batch-independent bias packs are precomputed once at
startup, requests are collected by a background worker into padded
fixed-shape batches (one XLA program, compiled at startup), and each request
gets back its class-id mask as PNG or JSON.

The reference ships only a notebook (visualize_segmentation_web.ipynb); this
is the deployment surface for the same model.

  python -m ifseg_tpu.cli.serve --checkpoint=ckpt --category-list='cat, dog' \\
      --port=8321 [--max-batch=8] [--batch-timeout-ms=5]

  POST /segment            body = image bytes (any PIL-readable format)
                           ?format=png (default; class-id PNG at model grid
                           upsampled to the input size) | json (areas)
  GET  /healthz            liveness + compiled state
  GET  /stats              request/batch counters (batching observability)
"""

import argparse
import io
import json
import logging
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
from PIL import Image

logger = logging.getLogger(__name__)


class SegService:
    """Owns the model, the precomputed serving pack, and the batching loop."""

    def __init__(self, cfg, params, categories, src_tokens, max_batch=8,
                 batch_timeout_ms=5.0, quantize="none"):
        import jax
        import jax.numpy as jnp

        from ifseg_tpu.eval.serving import SegServer, forward_served
        from ifseg_tpu.models.segofa import SegOFA

        self.cfg = cfg
        self.categories = categories
        self.max_batch = max_batch
        self.batch_timeout = batch_timeout_ms / 1e3
        self.size = cfg.model.patch_image_size
        self.grid = self.size // 16
        self.src = np.broadcast_to(src_tokens, (max_batch,) + src_tokens.shape[1:])

        model = SegOFA(cfg.model)
        server = SegServer(
            model, params, src_len=src_tokens.shape[1], quantize=quantize
        )
        self._params = server.params  # int8 tree when quantized
        self._pre = server.pre
        if quantize == "int8":
            r = server.quant_report
            logger.info(
                "int8 weight-only serving: %d tensors quantized (%d kept), "
                "%.0f MB -> %.0f MB",
                r["quantized"], r["kept"],
                r["bytes_fp32"] / 1e6, r["bytes_quant"] / 1e6,
            )

        if quantize == "int8":
            from ifseg_tpu.ops.quantization import dequantize_tree

            unpack = dequantize_tree
        else:
            unpack = lambda p: p  # noqa: E731

        @jax.jit
        def fwd(p, pre, src, img, bos):
            logits = forward_served(model, unpack(p), pre, src, img, bos)
            hw = self.grid * self.grid
            return jnp.argmax(logits[:, :hw].astype(jnp.float32), axis=-1)

        self._fwd = fwd
        self._bos = np.zeros((max_batch, 1), np.int32)
        self._q = queue.Queue()
        self.stats = {"requests": 0, "batches": 0, "batched_requests": 0}
        self.ready = False
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()

    def warmup(self):
        img = np.zeros((self.max_batch, self.size, self.size, 3), np.float32)
        np.asarray(self._fwd(self._params, self._pre, self.src, img, self._bos))
        self.ready = True
        logger.info("compiled serving program (batch=%d, %dpx)", self.max_batch, self.size)

    def _preprocess(self, data: bytes):
        # the network consumes RGB (training normalizes RGB after the
        # BGR-ordered augs flip back, segmentation_dataset.py; infer.py:140)
        image = Image.open(io.BytesIO(data)).convert("RGB")
        w0, h0 = image.size
        rgb = np.asarray(image.resize((self.size, self.size), Image.BILINEAR))
        rgb = rgb.astype(np.float32) / 255.0
        return (rgb - 0.5) / 0.5, (h0, w0)

    def submit(self, data: bytes, timeout: float = 120.0):
        """Blocking: preprocess, enqueue, wait for the batch worker."""
        net_in, orig = self._preprocess(data)
        ev = threading.Event()
        slot = {"img": net_in, "ev": ev, "mask": None, "error": None}
        self._q.put(slot)
        if not ev.wait(timeout):
            raise RuntimeError("segmentation worker timed out")
        if slot["error"] is not None:
            raise RuntimeError(f"segmentation worker failed: {slot['error']}")
        mask = slot["mask"]  # (grid, grid) int class ids
        return mask, orig

    def _loop(self):
        while True:
            first = self._q.get()
            batch = [first]
            deadline = time.monotonic() + self.batch_timeout
            while len(batch) < self.max_batch:
                rest = deadline - time.monotonic()
                if rest <= 0:
                    break
                try:
                    batch.append(self._q.get(timeout=rest))
                except queue.Empty:
                    break
            n = len(batch)
            try:
                imgs = np.zeros((self.max_batch, self.size, self.size, 3), np.float32)
                for i, slot in enumerate(batch):
                    imgs[i] = slot["img"]
                out = np.asarray(
                    self._fwd(self._params, self._pre, self.src, imgs, self._bos)
                )
                g = self.grid
                for i, slot in enumerate(batch):
                    slot["mask"] = out[i].reshape(g, g).astype(np.int32)
            except Exception as e:  # device failure etc.: fail the batch, not
                # the worker — pending requests get a 500 instead of a wedge
                logger.exception("batched forward failed")
                for slot in batch:
                    slot["error"] = repr(e)
                self.stats["errors"] = self.stats.get("errors", 0) + n
            finally:
                for slot in batch:
                    slot["ev"].set()
            self.stats["requests"] += n
            self.stats["batches"] += 1
            self.stats["batched_requests"] += n if n > 1 else 0


def _make_handler(svc: SegService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            logger.debug(fmt, *args)

        def _send(self, code, body, ctype="application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.startswith("/healthz"):
                body = json.dumps({"ok": True, "ready": svc.ready}).encode()
                self._send(200 if svc.ready else 503, body)
            elif self.path.startswith("/stats"):
                self._send(200, json.dumps(svc.stats).encode())
            else:
                self._send(404, b'{"error": "not found"}')

        def do_POST(self):
            if not self.path.startswith("/segment"):
                self._send(404, b'{"error": "not found"}')
                return
            length = int(self.headers.get("Content-Length", 0))
            data = self.rfile.read(length)
            try:
                mask, (h0, w0) = svc.submit(data)
            except RuntimeError as e:  # worker/device failure
                self._send(500, json.dumps({"error": str(e)[:200]}).encode())
                return
            except Exception as e:  # bad image etc.
                self._send(400, json.dumps({"error": str(e)[:200]}).encode())
                return
            if "format=json" in self.path:
                areas = {
                    svc.categories[int(c)]: int((mask == c).sum())
                    for c in np.unique(mask)
                    if int(c) < len(svc.categories)
                }
                self._send(200, json.dumps({"areas": areas, "grid": mask.shape[0]}).encode())
            else:
                up = Image.fromarray(mask.astype(np.uint8), mode="L").resize(
                    (w0, h0), Image.NEAREST
                )
                buf = io.BytesIO()
                up.save(buf, format="PNG")
                self._send(200, buf.getvalue(), ctype="image/png")

    return Handler


def build_service(args_list=None, params=None):
    """Build (cfg, service) from CLI flags; params may be injected (tests)."""
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", default="")
    p.add_argument("--category-list", required=True)
    p.add_argument("--arch", default="segofa_base")
    p.add_argument("--bpe-dir", default="assets/BPE")
    p.add_argument("--patch-image-size", type=int, default=512)
    p.add_argument("--port", type=int, default=8321)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--batch-timeout-ms", type=float, default=5.0)
    p.add_argument(
        "--quantize", default="none", choices=["none", "int8"],
        help="int8: weight-only quantization (per-channel scales); weights "
        "stream from HBM as int8 and dequantize inside the step",
    )
    args = p.parse_args(args_list)

    import jax

    from ifseg_tpu.config import Config, model_config_for_arch
    from ifseg_tpu.data.segmentation_dataset import (
        build_class_token_table,
        encode_text,
    )
    from ifseg_tpu.models.segofa import SegOFAVariables
    from ifseg_tpu.tokenization.dictionary import build_seg_dictionary
    from ifseg_tpu.tokenization.gpt2_bpe import GPT2BPE

    categories = [c.strip() for c in args.category_list.split(",") if c.strip()]
    num_seg = len(categories)
    cfg = Config()
    cfg = cfg.replace(
        model=model_config_for_arch(
            args.arch,
            num_seg_tokens=num_seg,
            patch_image_size=args.patch_image_size,
            orig_patch_image_size=args.patch_image_size,
        )
    )
    cfg.task.num_seg_tokens = num_seg
    cfg.task.category_list = args.category_list
    cfg.task.bpe_dir = args.bpe_dir

    dictionary = build_seg_dictionary(args.bpe_dir, num_seg_tokens=num_seg)
    bpe = GPT2BPE.from_dir(args.bpe_dir)
    parts = [np.asarray([dictionary.bos()], np.int64)]
    parts.append(encode_text(bpe, dictionary, f" {cfg.task.prompt_prefix.lstrip()}"))
    tokens_tbl, lengths_tbl = build_class_token_table(
        bpe, dictionary, categories + ["unknown"]
    )
    for i in range(num_seg + 1):
        parts.append(tokens_tbl[i, : lengths_tbl[i]].astype(np.int64))
    parts.append(np.asarray([dictionary.eos()], np.int64))
    src = np.concatenate(parts).astype(np.int32)[None]

    if params is None:
        if args.checkpoint:
            from ifseg_tpu.cli.infer import load_params

            params = load_params(args.checkpoint, cfg)
        else:
            _, params = SegOFAVariables.init(cfg.model, jax.random.PRNGKey(0))
            logger.warning("no --checkpoint: serving randomly initialized weights")

    svc = SegService(
        cfg, params, categories, src,
        max_batch=args.max_batch, batch_timeout_ms=args.batch_timeout_ms,
        quantize=args.quantize,
    )
    return args, svc


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    from ifseg_tpu.utils.profiling import enable_persistent_jit_cache

    enable_persistent_jit_cache()
    args, svc = build_service(argv)
    svc.warmup()
    httpd = ThreadingHTTPServer((args.host, args.port), _make_handler(svc))
    logger.info("serving on http://%s:%d", args.host, args.port)
    httpd.serve_forever()


if __name__ == "__main__":
    main()
