"""Single-image segmentation inference + visualization.

CLI replacement for the reference's visualize_segmentation_web.ipynb: load a
checkpoint with category overrides, keep-ratio preprocess, one surrogate
decoder pass, optional ResNet label propagation (topk=5, iters=25 in the
notebook), bilinear upsample to the original resolution, optional denseCRF
refinement, argmax, and a colormap overlay saved to disk.

Usage:
  python -m ifseg_tpu.cli.infer --image=cat_dog.jpeg \\
      --checkpoint=checkpoints/checkpoint_best \\
      --category-list='cat, dog' --arch=segofa_base \\
      --output=overlay.png [--crf-iters=10] [--resnet-iters=25]
"""

import argparse
import logging
import os
import sys

import numpy as np
from PIL import Image

logger = logging.getLogger(__name__)

# a qualitative colormap (Pascal-VOC-style bit shuffle)
def _colormap(n):
    cmap = np.zeros((n, 3), np.uint8)
    for i in range(n):
        r = g = b = 0
        c = i
        for j in range(8):
            r |= ((c >> 0) & 1) << (7 - j)
            g |= ((c >> 1) & 1) << (7 - j)
            b |= ((c >> 2) & 1) << (7 - j)
            c >>= 3
        cmap[i] = (r, g, b)
    return cmap


def load_params(checkpoint: str, cfg):
    import jax

    from ifseg_tpu.models.segofa import SegOFAVariables

    _, fresh = SegOFAVariables.init(cfg.model, jax.random.PRNGKey(0))
    if checkpoint.endswith(".pt"):
        from ifseg_tpu.checkpoint.convert import (
            convert_torch_state_dict,
            load_torch_checkpoint,
        )

        sd = load_torch_checkpoint(checkpoint)
        return convert_torch_state_dict(sd, cfg.model.vocab_size, fresh)
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    tree = ckptr.restore(os.path.abspath(checkpoint))
    state = tree.get("state", tree)
    return state["params"] if "params" in state else state


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--image", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--category-list", required=True)
    p.add_argument("--arch", default="segofa_base")
    p.add_argument("--output", default="overlay.png")
    p.add_argument("--bpe-dir", default="assets/BPE")
    p.add_argument("--patch-image-size", type=int, default=512)
    p.add_argument("--resnet-iters", type=int, default=25)
    p.add_argument("--resnet-topk", type=int, default=5)
    p.add_argument("--crf-iters", type=int, default=10)
    p.add_argument("--crf-backend", default="jax", choices=("jax", "cpp"),
                   help="on-device permutohedral mean field (jax) or the "
                        "ctypes C++ lattice (cpp)")
    p.add_argument("--alpha", type=float, default=0.5, help="overlay opacity")
    args = p.parse_args(argv)
    from ifseg_tpu.utils.profiling import enable_persistent_jit_cache

    enable_persistent_jit_cache()
    logging.basicConfig(level=logging.INFO, stream=sys.stdout)

    import jax
    import jax.numpy as jnp

    from ifseg_tpu.config import Config, model_config_for_arch
    from ifseg_tpu.data.segmentation_dataset import (
        SegmentationDataset,
        build_class_token_table,
    )
    from ifseg_tpu.data.transforms import KeepRatioResize, normalize_image
    from ifseg_tpu.models.segofa import SegOFA
    from ifseg_tpu.ops.resize import bilinear_matrix
    from ifseg_tpu.tokenization.dictionary import build_seg_dictionary
    from ifseg_tpu.tokenization.gpt2_bpe import GPT2BPE
    from ifseg_tpu.eval.evaluator import masked_label_propagation

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

    dictionary = build_seg_dictionary(
        args.bpe_dir, num_seg_tokens=num_seg
    )
    bpe = GPT2BPE.from_dir(args.bpe_dir)
    from ifseg_tpu.data.segmentation_dataset import encode_text

    # constant source: [bos, prompt, class names, eos] (nb cell 5)
    parts = [np.asarray([dictionary.bos()], np.int64)]
    parts.append(
        encode_text(bpe, dictionary, f" {cfg.task.prompt_prefix.lstrip()}")
    )
    tokens_tbl, lengths_tbl = build_class_token_table(
        bpe, dictionary, categories + ["unknown"]
    )
    for i in range(num_seg + 1):
        parts.append(tokens_tbl[i, : lengths_tbl[i]].astype(np.int64))
    parts.append(np.asarray([dictionary.eos()], np.int64))
    src = np.concatenate(parts).astype(np.int32)[None]

    params = load_params(args.checkpoint, cfg)
    model = SegOFA(cfg.model)

    image = Image.open(args.image).convert("RGB")
    rgb = np.asarray(image)
    bgr = rgb[:, :, ::-1].copy()
    H, W = rgb.shape[:2]
    resize = KeepRatioResize((args.patch_image_size * 4, args.patch_image_size))
    img_resized, _ = resize(bgr)
    net_in = normalize_image(img_resized[:, :, ::-1], (0.5,) * 3, (0.5,) * 3)[None]

    @jax.jit
    def forward(params, src, img, bos):
        logits, extra = model.apply(
            {"params": params},
            src_tokens=src,
            patch_images=img,
            bos_tokens=bos,
            deterministic=True,
        )
        return logits, extra["encoder_returns"]["image_embed_before_proj"]

    bos = np.zeros((1, 1), np.int32)
    logits, resnet_feats = forward(params, src, net_in, bos)
    hp = -(-img_resized.shape[0] // 16)
    wp = -(-img_resized.shape[1] // 16)
    hw = hp * wp
    probs = jax.nn.softmax(logits[:, :hw].astype(jnp.float32), axis=-1)
    if args.resnet_iters > 0:
        probs = masked_label_propagation(
            probs,
            resnet_feats,
            jnp.ones((hw,), bool),
            args.resnet_topk,
            args.resnet_iters,
        )
    probs = np.asarray(probs).reshape(hp, wp, num_seg)

    # bilinear upsample to original resolution (host; single image)
    ah = bilinear_matrix(hp, H)
    aw = bilinear_matrix(wp, W)
    up = np.einsum("Hk,kwc->Hwc", ah, probs)
    up = np.einsum("Wk,hkc->hWc", aw, up)

    if args.crf_iters > 0:
        if args.crf_backend == "jax":
            from ifseg_tpu.ops.crf_jax import dense_crf_jax

            up = np.asarray(dense_crf_jax(
                jnp.asarray(bgr, jnp.float32),
                jnp.asarray(up, jnp.float32),
                up.shape[0], up.shape[1], n_iter=args.crf_iters,
            ))
        else:
            from ifseg_tpu.ops.crf import dense_crf

            up = dense_crf(bgr, up.astype(np.float32), n_iter=args.crf_iters)

    seg = up.argmax(-1).astype(np.int32)
    cmap = _colormap(max(num_seg, 8))
    overlay = (
        args.alpha * cmap[seg % len(cmap)] + (1 - args.alpha) * rgb
    ).astype(np.uint8)
    Image.fromarray(overlay).save(args.output)
    seg_path = os.path.splitext(args.output)[0] + "_mask.png"
    Image.fromarray(cmap[seg % len(cmap)]).save(seg_path)
    logger.info("classes present: %s", {
        categories[i]: int((seg == i).sum()) for i in np.unique(seg)
    })
    logger.info("wrote %s and %s", args.output, seg_path)


if __name__ == "__main__":
    main()
