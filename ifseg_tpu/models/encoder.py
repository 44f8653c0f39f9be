"""SegOFA encoder: ResNet image stem + token path + OFA transformer stack.

Mirrors models/segofa/encoder_module.py:
  - real-image path (`encode`, ref :677-851): ResNet -> image_proj -> [image ‖
    text] with type embeddings and embed-LNs, abs-pos q·k bias + per-layer
    token/image relative biases (image bias double-bilinear-interpolated when
    the runtime grid differs from the orig 32x32 grid, ref :799-808)
  - artificial-image path (`encode_artificial`, ref :499-675): grid cells are
    category-word EmbeddingBag means.  TPU-first reformulation: the bag over
    every cell is a per-class mean-embedding table (num_classes, D) computed
    once, then a gather by grid id — identical math (mean bag), O(C·T) instead
    of O(B·1024·T) embedding traffic.

Batch-major (B, L, D); biases are computed batch-independent as (H, L, L) and
broadcast (position ids are identical across the batch), unlike the reference
which materializes per-sample copies.
"""

import logging
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ifseg_tpu.config import ModelConfig
from ifseg_tpu.ops.resize import bilinear_matrix_dyn, resize_bilinear
from .layers import EncoderLayer
from .position import (
    gather_grid_bias_all_layers,
    gather_rel_bias,
    gather_rel_bias_all_layers,
    image_grid_position_ids,
    image_num_rel_dis,
    image_rel_bucket_direct,
    image_rp_bucket_for_grid,
    interp_grid_bias,
    interp_grid_bias_mats,
    make_token_bucket_position,
)
from .resnet import RESNET_LAYERS, ResNetStem

logger = logging.getLogger(__name__)

PAD = 1


def _remat_policy(cfg: "ModelConfig"):
    """Checkpoint policy for nn.remat (cfg.remat_policy): 'save-attn' keeps
    each attention kernel's output (tagged 'attn_out' in attention.py) so the
    backward recomputes only matmuls/LNs, never the flash kernels."""
    policy = getattr(cfg, "remat_policy", "full")
    if policy == "auto":
        # unresolved 'auto' (a path that never went through
        # train.trainer.resolve_remat_policy, e.g. eval-only construction):
        # fall back to the safe save-attn policy — forward-only callers
        # never pay recompute anyway
        policy = "save-attn"
    # 'attn_lse' rides along with the kernel output: the flash backward
    # rebuilds p from the saved row logsumexp (ops/flash_attention._fwd)
    if policy == "save-attn":
        return jax.checkpoint_policies.save_only_these_names(
            "attn_out", "attn_lse"
        )
    if policy == "save-attn-ffn":
        return jax.checkpoint_policies.save_only_these_names(
            "attn_out", "attn_lse", "ffn_act"
        )
    return None  # full recompute


def _layerdrop(module, rate: float, deterministic: bool, x_new, x_old):
    """LayerDrop (fairseq LayerDropModuleList; unify_transformer.py:220-223):
    skip a whole layer iid with prob ``rate`` during training.  The layer is
    still computed under jit (static graph); its output is discarded, which
    matches the reference's training dynamics exactly."""
    if rate == 0.0 or deterministic:
        return x_new
    keep = jax.random.bernoulli(module.make_rng("dropout"), 1.0 - rate)
    return jnp.where(keep, x_new, x_old)


def class_mean_embeddings(embed_table, class_tokens, class_lengths):
    """Per-class mean of category-word token embeddings (EmbeddingBag mean mode,
    encoder_module.py:147-148 / :529-542).

    embed_table: (V, D); class_tokens: (C, T) padded ids; class_lengths: (C,)
    """
    emb = jnp.take(embed_table, class_tokens, axis=0)  # (C, T, D)
    t = class_tokens.shape[1]
    mask = (jnp.arange(t)[None, :] < class_lengths[:, None]).astype(emb.dtype)
    summed = jnp.sum(emb * mask[:, :, None], axis=1)
    return summed / class_lengths[:, None].astype(emb.dtype)


class Encoder(nn.Module):
    cfg: ModelConfig
    embed_tokens: nn.Embed  # shared with decoder
    plan: Optional[object] = None  # ParallelPlan (PP/EP/CP product wiring)

    def setup(self):
        cfg = self.cfg
        d = cfg.encoder_embed_dim
        ln = lambda: nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32)
        self.type_embedding = nn.Embed(2, d, param_dtype=jnp.float32, dtype=cfg_dtype(cfg))
        self.layernorm_embedding = ln()
        self.patch_layernorm_embedding = ln()
        self.embed_images = ResNetStem(RESNET_LAYERS[cfg.resnet_type], dtype=cfg_dtype(cfg))
        self.image_proj = nn.Dense(d, param_dtype=jnp.float32, dtype=cfg_dtype(cfg))
        self.embed_positions = nn.Embed(cfg.max_source_positions + 2, d, param_dtype=jnp.float32)
        self.embed_image_positions = nn.Embed(cfg.image_bucket_size**2 + 1, d, param_dtype=jnp.float32)
        self.pos_ln = ln()
        self.image_pos_ln = ln()
        self.pos_q_linear = nn.Dense(d, param_dtype=jnp.float32, dtype=jnp.float32)
        self.pos_k_linear = nn.Dense(d, param_dtype=jnp.float32, dtype=jnp.float32)

        heads = cfg.encoder_attention_heads
        nlayers = cfg.encoder_layers
        self.token_rel_pos_table = self.param(
            "token_rel_pos_table",
            nn.initializers.zeros,
            (nlayers, 2 * cfg.token_bucket_size - 1, heads),
            jnp.float32,
        )
        self.image_rel_pos_table = self.param(
            "image_rel_pos_table",
            nn.initializers.zeros,
            (nlayers, image_num_rel_dis(cfg.image_bucket_size), heads),
            jnp.float32,
        )
        dpr = np.linspace(0, cfg.encoder_drop_path_rate, nlayers)
        # deterministic (last call arg) is static; remat recomputes each
        # layer's forward during backward instead of keeping activations
        layer_cls = (
            nn.remat(
                EncoderLayer, static_argnums=(4,), policy=_remat_policy(cfg)
            )
            if cfg.checkpoint_activations
            else EncoderLayer
        )
        self.layers = [
            layer_cls(
                embed_dim=d,
                ffn_dim=cfg.encoder_ffn_embed_dim,
                num_heads=heads,
                attn_scale_factor=cfg.attn_scale_factor,
                scale_attn=cfg.scale_attn,
                scale_fc=cfg.scale_fc,
                scale_heads=cfg.scale_heads,
                scale_resids=cfg.scale_resids,
                activation_fn=cfg.activation_fn,
                dropout=cfg.dropout,
                attention_dropout=cfg.attention_dropout,
                activation_dropout=cfg.activation_dropout,
                drop_path_rate=float(dpr[i]),
                dtype=cfg_dtype(cfg),
                use_flash=_flash_enabled(cfg),
                use_adapter=cfg.adapter,
                adapter_dim=cfg.adapter_dim,
                plan=self.plan,
                use_moe=_moe_layer(self.plan, i),
                name=f"layers_{i}",
            )
            for i in range(nlayers)
        ]
        self.layer_norm = ln()
        self.dropout_layer = nn.Dropout(rate=cfg.dropout)
        if cfg.encoder_prompt:
            from .layers import PromptEncoder

            self.prompt_encoder = PromptEncoder(
                length=cfg.encoder_prompt_length,
                embed_dim=d,
                num_layers=nlayers,
                num_heads=heads,
                projection=cfg.encoder_prompt_projection,
                proj_dim=cfg.encoder_prompt_dim,
                name="prompt_encoder",
            )

    # ------------------------------------------------------------------ utils

    def _pos_scaling(self) -> float:
        cfg = self.cfg
        return (
            float(
                cfg.encoder_embed_dim
                / cfg.encoder_attention_heads
                * cfg.attn_scale_factor
            )
            ** -0.5
        )

    def _abs_bias(self, pos_embed) -> jnp.ndarray:
        """(H, L, L) q·kᵀ bias from post-LN position embeddings
        (encoder_module.py:611-621); batch-independent so computed once."""
        heads = self.cfg.encoder_attention_heads
        l = pos_embed.shape[0]
        q = (self.pos_q_linear(pos_embed) * self._pos_scaling()).reshape(l, heads, -1)
        k = self.pos_k_linear(pos_embed).reshape(l, heads, -1)
        return jnp.einsum("qhd,khd->hqk", q, k, preferred_element_type=jnp.float32)

    def _image_pos_embed(self, h: int, w: int) -> jnp.ndarray:
        """(h*w, D) image position embeddings with bilinear interpolation from
        the orig grid when the runtime grid is larger (encoder_module.py:358-371)."""
        cfg = self.cfg
        orig_hw = cfg.orig_patch_image_size // 16
        if h * w > orig_hw * orig_hw:
            ids = image_grid_position_ids(orig_hw, orig_hw, cfg.image_bucket_size)
            pe = self.embed_image_positions(jnp.asarray(ids))
            pe = pe.reshape(orig_hw, orig_hw, -1)
            pe = resize_bilinear(pe, (h, w), h_axis=0, w_axis=1)
            return pe.reshape(h * w, -1)
        ids = image_grid_position_ids(h, w, cfg.image_bucket_size)
        return self.embed_image_positions(jnp.asarray(ids))

    def _stem(self, patch_images, valid_hw=None):
        """ResNet stem with its output pinned to batch-only sharding.

        Under a ParallelPlan, shard_map boundaries downstream (ring
        attention's L-sharded specs) propagate a 'model'-axis sharding
        backward through image_proj's reshape onto the stem's SPATIAL dims.
        Besides being a layout nobody wants (the stem is data-parallel by
        design), XLA's SPMD partitioner miscompiles the halo exchange of a
        3x3 SAME conv when the per-device spatial shard is smaller than the
        kernel radius (stage-3 feature maps are 2x2 at 32px: shard = 1 row;
        reproduced on XLA:CPU: maxerr 47 vs dense on identical inputs).  The
        anchor stops that propagation at the stem boundary."""
        feats = self.embed_images(patch_images, valid_hw=valid_hw)
        plan = self.plan
        mesh = getattr(plan, "mesh", None) if plan is not None else None
        if mesh is None or self.is_initializing():
            return feats
        baxes = tuple(
            a for a in mesh.axis_names
            if a != getattr(plan, "axis", "model") and mesh.shape[a] > 1
        )
        bdiv = 1
        for a in baxes:
            bdiv *= mesh.shape[a]
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = (
            P(baxes, None, None, None)
            if baxes and feats.shape[0] % bdiv == 0
            else P(None, None, None, None)
        )
        return jax.lax.with_sharding_constraint(feats, NamedSharding(mesh, spec))

    def _text_embed(self, src_tokens, deterministic):
        """Token path: embed + type(0) + LN + dropout (encoder_module.py:573-586)."""
        cfg = self.cfg
        x = self.embed_tokens(src_tokens).astype(cfg_dtype(cfg))
        if cfg.add_type_embedding:
            x = x + self.type_embedding(jnp.zeros_like(src_tokens))
        if cfg.layernorm_embedding:
            x = self.layernorm_embedding(x).astype(cfg_dtype(cfg))
        if cfg.dropout > 0:
            x = self.dropout_layer(x, deterministic=deterministic)
        return x

    def _image_token_embed(self, image_embed, src_tokens, deterministic):
        """Image path: + type(1) + patch-LN + dropout (encoder_module.py:589-600)."""
        cfg = self.cfg
        x = image_embed.astype(cfg_dtype(cfg))
        if cfg.add_type_embedding:
            ones = jnp.ones(image_embed.shape[:2], dtype=src_tokens.dtype)
            x = x + self.type_embedding(ones)
        if cfg.patch_layernorm_embedding:
            x = self.patch_layernorm_embedding(x).astype(cfg_dtype(cfg))
        if cfg.dropout > 0:
            x = self.dropout_layer(x, deterministic=deterministic)
        return x

    def _run_layers(
        self,
        x,
        padding_mask,
        pos_embed_all,  # (L, D) post-LN concat [image ‖ text]
        src_len: int,
        image_hw: Tuple[int, int],
        rel_bias_grid_hw: Optional[Tuple[int, int]] = None,
        deterministic: bool = True,
        img_bias_fn=None,  # (layer_idx) -> (H, hw, hw); overrides the static path
    ):
        cfg = self.cfg
        l_total = x.shape[1]
        hw = image_hw[0] * image_hw[1]

        prompt_all = None
        if cfg.encoder_prompt and cfg.encoder_prompt_type == "prefix":
            # (layers, 2, H, P, dh) prefix KV, batch-independent
            # (encoder_module.py:510-521)
            prompt_all = self.prompt_encoder(deterministic)

        bias0 = self._abs_bias(pos_embed_all)  # (H, L, L)

        token_bucket = make_token_bucket_position(cfg.token_bucket_size)[
            :src_len, :src_len
        ]
        tok_all = gather_rel_bias_all_layers(self.token_rel_pos_table, token_bucket)
        img_all_interp = None  # (nl, H, hw, hw) when available in one piece
        if img_bias_fn is None:
            image_bucket = image_rp_bucket_for_grid(
                *rel_bias_grid_hw, cfg.image_bucket_size
            )
            # one fused gather for every layer, with the structure-aware
            # backward (delta-class contraction instead of sort-based
            # scatter-add; see position.gather_grid_bias_all_layers).  On the
            # identity-interp path (512px train/infer) the expansion is
            # emitted directly in compute dtype — exact, and it halves the
            # ~300 MB fp32 (nl, H, hw, hw) HBM round-trip; when bilinear
            # interp follows, stay fp32 so the interp matmuls keep fp32
            # operands (real-checkpoint bias numerics)
            ident_interp = tuple(rel_bias_grid_hw) == tuple(image_hw)
            img_all = gather_grid_bias_all_layers(
                self.image_rel_pos_table, image_bucket, rel_bias_grid_hw,
                dtype=cfg_dtype(cfg) if ident_interp else jnp.float32,
            )
            if ident_interp:
                img_all_interp = img_all  # identity interp (512px train/infer)

            def img_bias_fn(i):
                return interp_grid_bias(img_all[i], rel_bias_grid_hw, image_hw)

        pp = getattr(self.plan, "pipeline_parallel", 1) if self.plan else 1
        if pp > 1 and not self.is_initializing():
            if cfg.encoder_layerdrop > 0:
                # the scanned PP stage body treats layers homogeneously and
                # does not implement stochastic whole-layer skip — fail loud
                # rather than silently training different dynamics
                raise NotImplementedError(
                    "--encoder-layerdrop is not supported with "
                    "--pipeline-parallel"
                )

            def bias_fn(i):
                b_ = bias0
                b_ = b_.at[:, l_total - src_len :, l_total - src_len :].add(tok_all[i])
                return b_.at[:, :hw, :hw].add(img_bias_fn(i)).astype(cfg_dtype(cfg))

            x = self._run_layers_pp(
                x, padding_mask, bias_fn, prompt_all, deterministic
            )
        else:
            # assemble the all-layer bias pack in ONE fused pad+pad+add pass
            # (nl, H, L, L) instead of two full-tensor `.at[].add` copies per
            # layer: halves the bias-build HBM traffic on the training hot
            # path (the serving path precomputes per checkpoint instead,
            # precompute_biases below)
            nl = len(self.layers)
            if img_all_interp is None:
                img_all_interp = jnp.stack([img_bias_fn(i) for i in range(nl)])
            # pack dtype = compute dtype: bf16 under bf16 training halves the
            # dominant bias HBM traffic (build + per-layer kernel reads +
            # dbias) and matches the reference's fp16 bias precision.  Each
            # component is cast BEFORE the adds so the whole (nl, H, L, L)
            # add tree runs in compute dtype (no fp32 intermediates); each
            # astype's vjp upcasts its branch cotangent to fp32 before the
            # gather scatter-add into the tables, so table-grad accumulation
            # stays fp32 exactly as before
            cd = cfg_dtype(cfg)
            pack = (
                bias0[None].astype(cd)
                + jnp.pad(tok_all.astype(cd), ((0, 0), (0, 0), (hw, 0), (hw, 0)))
                + jnp.pad(
                    img_all_interp.astype(cd),
                    ((0, 0), (0, 0), (0, src_len), (0, src_len)),
                )
            )
            for i, layer in enumerate(self.layers):
                y = layer(
                    x, padding_mask, pack[i], deterministic,
                    prompt_all[i] if prompt_all is not None else None,
                )
                x = _layerdrop(
                    self, cfg.encoder_layerdrop, deterministic, y, x
                )
        x = self.layer_norm(x).astype(cfg_dtype(cfg))
        return x

    def _run_layers_pp(self, x, padding_mask, bias_fn, prompt_all, deterministic):
        """GPipe over the encoder layer stack (--pipeline-parallel; reference
        model_parallel/models/pipeline_parallel_transformer/model.py:316-319).

        Layers are homogeneous, so stage s applies layers [s*Lps, (s+1)*Lps)
        via lax.scan over its resident (stacked) parameters while microbatches
        rotate around the ring (parallel/pipeline.py).  Stochastic depth is
        disabled under PP (one scanned module can't vary drop_path per layer);
        dropout works via a folded per-(stage, layer, microbatch) rng."""
        import jax.random as jrandom

        from ifseg_tpu.parallel.pipeline import gpipe

        cfg = self.cfg
        plan = self.plan
        nl = len(self.layers)
        s = plan.pipeline_parallel
        assert nl % s == 0, f"{nl} layers not divisible by {s} pipeline stages"
        lps = nl // s
        m = plan.chunks
        b = x.shape[0]
        if cfg.encoder_drop_path_rate > 0 and not deterministic:
            # the scanned homogeneous stage body cannot vary drop_path per
            # layer — stochastic depth is OFF under PP; unlike layerdrop this
            # only changes regularization strength, so warn instead of raising
            logger.warning(
                "--pipeline-parallel disables encoder stochastic depth "
                "(drop_path_rate=%.2f ignored)", cfg.encoder_drop_path_rate,
            )

        biases = jnp.stack([bias_fn(i) for i in range(nl)])  # (nl, H, L, L)
        layer_params = [
            self.variables["params"][f"layers_{i}"] for i in range(nl)
        ]
        stacked = jax.tree_util.tree_map(
            lambda *ps: jnp.stack(ps), *layer_params
        )
        stage_params = jax.tree_util.tree_map(
            lambda a: a.reshape(s, lps, *a.shape[1:]), stacked
        )
        consts = {"bias": biases.reshape(s, lps, *biases.shape[1:])}
        if prompt_all is not None:
            consts["prompt"] = prompt_all.reshape(
                s, lps, *prompt_all.shape[1:]
            )

        bcast = None
        if not deterministic and (
            cfg.dropout > 0 or cfg.attention_dropout > 0
            or cfg.activation_dropout > 0
        ):
            bcast = {"rng": self.make_rng("dropout")}

        layer_mod = EncoderLayer(
            embed_dim=cfg.encoder_embed_dim,
            ffn_dim=cfg.encoder_ffn_embed_dim,
            num_heads=cfg.encoder_attention_heads,
            attn_scale_factor=cfg.attn_scale_factor,
            scale_attn=cfg.scale_attn,
            scale_fc=cfg.scale_fc,
            scale_heads=cfg.scale_heads,
            scale_resids=cfg.scale_resids,
            activation_fn=cfg.activation_fn,
            dropout=cfg.dropout,
            attention_dropout=cfg.attention_dropout,
            activation_dropout=cfg.activation_dropout,
            drop_path_rate=0.0,
            dtype=cfg_dtype(cfg),
            use_flash=_flash_enabled(cfg),
            use_adapter=cfg.adapter,
            adapter_dim=cfg.adapter_dim,
            parent=None,  # functional use: not a submodule of this Encoder
        )

        def stage_fn(p_stage, c_stage, bc, xx, mbrow, mb):
            # xx: carried activations; mbrow["mask"]: this microbatch's
            # padding mask, read locally (never rotated); mb: microbatch idx
            mm = mbrow["mask"]
            stage_idx = jax.lax.axis_index(plan.axis)

            def body(carry, inp):
                j, p_l = inp[0], inp[1]
                bias_l = inp[2]["bias"]
                pkv = inp[2].get("prompt")
                rngs = None
                if bc is not None:
                    key = jrandom.fold_in(bc["rng"], stage_idx * 4096 + j)
                    rngs = {"dropout": jrandom.fold_in(key, mb)}
                y = layer_mod.apply(
                    {"params": p_l}, carry, mm, bias_l, deterministic, pkv,
                    rngs=rngs,
                )
                return y, None

            xx, _ = jax.lax.scan(
                body, xx, (jnp.arange(lps), p_stage, c_stage)
            )
            return xx

        return gpipe(
            stage_params, stage_fn, x, plan.mesh,
            axis=plan.axis, stage_consts=consts, bcast=bcast,
            mb_consts={"mask": padding_mask}, chunks=m,
        )

    # --------------------------------------------------------------- serving

    def precompute_biases(self, src_len: int, image_hw: Tuple[int, int]):
        """Batch-independent bias pack for a FIXED input shape: every
        attention bias and position embedding depends only on params + shape,
        so a serving deployment computes them once per checkpoint instead of
        per forward (ifseg_tpu/eval/serving.py)."""
        cfg = self.cfg
        h, w = image_hw
        hw = h * w
        t = src_len
        pos_text = self.pos_ln(self.embed_positions(jnp.arange(t)))
        pos_img = self.image_pos_ln(self._image_pos_embed(h, w))
        pos_all = jnp.concatenate([pos_img, pos_text], axis=0)

        bias0 = self._abs_bias(pos_all)
        l_total = hw + t
        token_bucket = make_token_bucket_position(cfg.token_bucket_size)[:t, :t]
        tok_all = gather_rel_bias_all_layers(self.token_rel_pos_table, token_bucket)
        orig_hw = cfg.orig_patch_image_size // 16
        image_bucket = image_rp_bucket_for_grid(orig_hw, orig_hw, cfg.image_bucket_size)
        img_all = gather_rel_bias_all_layers(self.image_rel_pos_table, image_bucket)

        biases = []
        for i in range(len(self.layers)):
            img_b = interp_grid_bias(img_all[i], (orig_hw, orig_hw), image_hw)
            bias = bias0
            bias = bias.at[:, l_total - t :, l_total - t :].add(tok_all[i])
            bias = bias.at[:, :hw, :hw].add(img_b)
            biases.append(bias.astype(cfg_dtype(cfg)))
        return {"pos_all": pos_all, "biases": jnp.stack(biases)}

    def encode_served(self, src_tokens, patch_images, pre, deterministic=True):
        """encode() with precomputed biases (inference fast path)."""
        cfg = self.cfg
        feats = self._stem(patch_images.astype(cfg_dtype(cfg)))
        b, h, w, _ = feats.shape
        hw = h * w
        resnet_feats = feats.reshape(b, hw, -1)
        image_embed_pre = self.image_proj(resnet_feats)
        image_pad = jnp.zeros((b, hw), bool)
        text_pad = src_tokens == PAD
        padding_mask = jnp.concatenate([image_pad, text_pad], axis=1)

        x_text = self._text_embed(src_tokens, deterministic)
        x_img = self._image_token_embed(image_embed_pre, src_tokens, deterministic)
        x = jnp.concatenate([x_img, x_text], axis=1)
        x = x * (1.0 - padding_mask[:, :, None].astype(x.dtype))
        for i, layer in enumerate(self.layers):
            x = layer(x, padding_mask, pre["biases"][i], deterministic)
        x = self.layer_norm(x).astype(cfg_dtype(cfg))
        return {
            "encoder_out": x,
            "encoder_padding_mask": padding_mask,
            "position_embeddings": pre["pos_all"],
            "image_embed_before_scale": image_embed_pre,
            "image_embed_before_proj": resnet_feats,
            "image_embed_shape": (h, w),
        }

    # ---------------------------------------------------------------- forward

    def encode(
        self,
        src_tokens,  # (B, T)
        patch_images,  # (B, H, W, 3) normalized
        patch_masks=None,  # (B,) bool
        deterministic: bool = True,
    ) -> Dict[str, Any]:
        """Real-image forward (encoder_module.py:677-851)."""
        cfg = self.cfg
        feats = self._stem(patch_images.astype(cfg_dtype(cfg)))  # (B,h,w,1024)
        b, h, w, _ = feats.shape
        hw = h * w
        resnet_feats = feats.reshape(b, hw, -1)
        image_embed_pre = self.image_proj(resnet_feats)  # (B, hw, D)

        image_pad = jnp.zeros((b, hw), bool)
        if patch_masks is not None:
            image_pad = image_pad | (~patch_masks)[:, None]
        text_pad = src_tokens == PAD
        padding_mask = jnp.concatenate([image_pad, text_pad], axis=1)

        x_text = self._text_embed(src_tokens, deterministic)
        x_img = self._image_token_embed(image_embed_pre, src_tokens, deterministic)
        x = jnp.concatenate([x_img, x_text], axis=1)
        x = x * (1.0 - padding_mask[:, :, None].astype(x.dtype))

        t = src_tokens.shape[1]
        pos_text = self.pos_ln(self.embed_positions(jnp.arange(t)))
        pos_img = self.image_pos_ln(self._image_pos_embed(h, w))
        pos_all = jnp.concatenate([pos_img, pos_text], axis=0)  # (L, D)

        orig_hw = cfg.orig_patch_image_size // 16
        x = self._run_layers(
            x,
            padding_mask,
            pos_all,
            src_len=t,
            image_hw=(h, w),
            rel_bias_grid_hw=(orig_hw, orig_hw),
            deterministic=deterministic,
        )
        return {
            "encoder_out": x,  # (B, L, D)
            "encoder_padding_mask": padding_mask,
            "position_embeddings": pos_all,  # (L, D) post-LN
            "image_embed_before_scale": image_embed_pre,
            "image_embed_before_proj": resnet_feats,
            "image_embed_shape": (h, w),
        }

    def encode_padded(
        self,
        src_tokens,  # (B, T)
        patch_images,  # (B, Hb, Wb, 3) zero-padded to a bucket, normalized
        img_h,  # traced scalar: valid image height
        img_w,  # traced scalar: valid image width
        deterministic: bool = True,
    ) -> Dict[str, Any]:
        """Native-resolution eval forward under one compiled shape per bucket.

        The reference runs eval at the exact resized shape
        (encoder_module.py:677-851 with get_patch_images_info :333-372); under
        XLA we zero-pad the image into a shape bucket and thread the *valid*
        extent (img_h, img_w) through as traced scalars: the ResNet masks its
        padding (see resnet.ResNetStem), position embeddings and relative
        biases are produced by dynamic-valid interpolation matrices
        (ops.resize.bilinear_matrix_dyn), and invalid patch tokens are
        attention-masked.  Valid-token outputs bit-match the unpadded forward.
        """
        cfg = self.cfg
        feats = self._stem(
            patch_images.astype(cfg_dtype(cfg)), valid_hw=(img_h, img_w)
        )
        b, Hp, Wp, _ = feats.shape
        hw = Hp * Wp
        # (img_h, img_w) may be (B,) vectors with per-row exact pixel extents
        # (used above for stem masking); positions and relative biases depend
        # only on the ceil-16 PATCH extents, which the evaluator guarantees
        # are equal across the rows of a group — so they are computed ONCE
        # for the whole batch (the per-sample alternative rebuilds every
        # (H, L, L) bias per row: measured 30x slower at the (512,768)
        # bucket).  Scalar extents keep the original single-extent semantics.
        img_h_s = jnp.max(img_h) if jnp.ndim(img_h) else img_h
        img_w_s = jnp.max(img_w) if jnp.ndim(img_w) else img_w
        hp = -(-img_h_s // 16)
        wp = -(-img_w_s // 16)
        resnet_feats = feats.reshape(b, hw, -1)
        image_embed_pre = self.image_proj(resnet_feats)

        r = jnp.arange(hw) // Wp
        c = jnp.arange(hw) % Wp
        grid_valid = (r < hp) & (c < wp)  # (hw,)
        image_pad = jnp.broadcast_to(~grid_valid[None, :], (b, hw))
        text_pad = src_tokens == PAD
        padding_mask = jnp.concatenate([image_pad, text_pad], axis=1)

        x_text = self._text_embed(src_tokens, deterministic)
        x_img = self._image_token_embed(image_embed_pre, src_tokens, deterministic)
        x = jnp.concatenate([x_img, x_text], axis=1)
        x = x * (1.0 - padding_mask[:, :, None].astype(x.dtype))

        t = src_tokens.shape[1]
        pos_text = self.pos_ln(self.embed_positions(jnp.arange(t)))

        orig_hw = cfg.orig_patch_image_size // 16
        use_interp = (hp * wp) > (orig_hw * orig_hw)
        ah = bilinear_matrix_dyn(orig_hw, Hp, hp)
        aw = bilinear_matrix_dyn(orig_hw, Wp, wp)

        def pos_interp(_):
            ids = image_grid_position_ids(orig_hw, orig_hw, cfg.image_bucket_size)
            pe = self.embed_image_positions(jnp.asarray(ids)).reshape(
                orig_hw, orig_hw, -1
            )
            pe = jnp.einsum("Hi,ijd->Hjd", ah, pe.astype(jnp.float32))
            pe = jnp.einsum("Wj,Hjd->HWd", aw, pe)
            return pe.reshape(hw, -1)

        def pos_gather(_):
            ids = jnp.clip(
                r * cfg.image_bucket_size + c + 1, 0, cfg.image_bucket_size**2
            )
            return self.embed_image_positions(ids).astype(jnp.float32)

        pos_img_raw = jax.lax.cond(use_interp, pos_interp, pos_gather, None)
        pos_img = self.image_pos_ln(pos_img_raw)
        pos_all = jnp.concatenate([pos_img, pos_text], axis=0)

        orig_bucket = image_rp_bucket_for_grid(
            orig_hw, orig_hw, cfg.image_bucket_size
        )
        padded_bucket = image_rel_bucket_direct(Hp, Wp, cfg.image_bucket_size)

        def img_bias_fn(i):
            def interp(_):
                bias = gather_rel_bias(self.image_rel_pos_table[i], orig_bucket)
                return interp_grid_bias_mats(bias, ah, aw, (orig_hw, orig_hw))

            def direct(_):
                return gather_rel_bias(self.image_rel_pos_table[i], padded_bucket)

            return jax.lax.cond(use_interp, interp, direct, None)

        x = self._run_layers(
            x,
            padding_mask,
            pos_all,
            src_len=t,
            image_hw=(Hp, Wp),
            deterministic=deterministic,
            img_bias_fn=img_bias_fn,
        )
        return {
            "encoder_out": x,
            "encoder_padding_mask": padding_mask,
            "position_embeddings": pos_all,
            "image_embed_before_scale": image_embed_pre,
            "image_embed_before_proj": resnet_feats,
            "image_embed_shape": (Hp, Wp),
            "valid_hw": (hp, wp),
            "grid_valid": grid_valid,
        }

    def encode_artificial(
        self,
        src_tokens,  # (B, T)
        grid_ids,  # (B, hw) int class ids in [0, num_classes)
        class_tokens,  # (C, Tname) padded category-word token ids
        class_lengths,  # (C,)
        deterministic: bool = True,
    ) -> Dict[str, Any]:
        """Artificial-image forward (encoder_module.py:499-675)."""
        cfg = self.cfg
        h = w = cfg.patch_image_size // 16
        b = src_tokens.shape[0]
        class_embeds = class_mean_embeddings(
            self.embed_tokens.embedding, class_tokens, class_lengths
        )
        image_embed = jnp.take(class_embeds, grid_ids, axis=0)  # (B, hw, D)

        image_pad = jnp.zeros((b, h * w), bool)
        text_pad = src_tokens == PAD
        padding_mask = jnp.concatenate([image_pad, text_pad], axis=1)

        x_text = self._text_embed(src_tokens, deterministic)
        x_img = self._image_token_embed(image_embed, src_tokens, deterministic)
        x = jnp.concatenate([x_img, x_text], axis=1)
        x = x * (1.0 - padding_mask[:, :, None].astype(x.dtype))

        t = src_tokens.shape[1]
        pos_text = self.pos_ln(self.embed_positions(jnp.arange(t)))
        pos_img = self.image_pos_ln(self._image_pos_embed(h, w))
        pos_all = jnp.concatenate([pos_img, pos_text], axis=0)

        x = self._run_layers(
            x,
            padding_mask,
            pos_all,
            src_len=t,
            image_hw=(h, w),
            rel_bias_grid_hw=(h, w),
            deterministic=deterministic,
        )
        return {
            "encoder_out": x,
            "encoder_padding_mask": padding_mask,
            "position_embeddings": pos_all,
            "image_embed_before_scale": image_embed,
            "image_embed_before_proj": None,
            "image_embed_shape": (h, w),
        }


def _moe_layer(plan, i: int) -> bool:
    """Every plan.moe_freq-th layer's FFN becomes a BASE MoE layer (the
    reference inserts BASE layers at an interval, modules/base_layer.py)."""
    return (
        plan is not None
        and plan.moe_experts > 1
        and (i % plan.moe_freq) == (plan.moe_freq - 1)
    )


def _flash_enabled(cfg: ModelConfig) -> bool:
    if not cfg.use_flash_attention:
        return False
    from ifseg_tpu.ops.flash_attention import flash_available

    return flash_available()


def cfg_dtype(cfg: ModelConfig):
    return jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
