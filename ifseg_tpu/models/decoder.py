"""SegOFA surrogate decoder: one non-autoregressive parallel pass.

Mirrors models/segofa/decoder_module.py:486-677 (`extract_features_scriptable_
surrogate`): decoder input = [BOS embedding ‖ encoder image features], seg-grid
positional table bilinearly interpolated to the runtime grid, per-layer seg
relative bias with the BOS slot threaded through the interpolation
(ref :601-627), causal self-attention unless full_context_alignment, cross
attention to the full encoder sequence with a q·kᵀ cross position bias, and a
`seg_projection` head (optionally weight-tied to `seg_embed_tokens`,
ref :128-137).  Output position i predicts grid cell i (the last position is
the EOS slot).
"""

import logging
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ifseg_tpu.config import ModelConfig
from ifseg_tpu.ops.resize import bilinear_matrix_dyn, resize_bilinear
from .encoder import _flash_enabled, _layerdrop, _moe_layer, _remat_policy, cfg_dtype
from .layers import DecoderLayer
from .position import (
    gather_grid_bias_all_layers,
    gather_rel_bias,
    gather_rel_bias_all_layers,
    image_num_rel_dis,
    interp_seg_bias_with_bos,
    interp_seg_bias_with_bos_mats,
    make_image_bucket_position,
)

logger = logging.getLogger(__name__)


class Decoder(nn.Module):
    cfg: ModelConfig
    embed_tokens: nn.Embed  # shared with encoder
    plan: Optional[object] = None  # ParallelPlan (PP/EP/CP product wiring)

    def setup(self):
        cfg = self.cfg
        d = cfg.decoder_embed_dim
        ln = lambda: nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32)
        init_embed = nn.initializers.normal(stddev=d**-0.5)
        self.seg_embed_tokens = self.param(
            "seg_embed_tokens", init_embed, (cfg.num_seg_tokens, d), jnp.float32
        )
        if not cfg.tie_seg_projection:
            self.seg_projection = self.param(
                "seg_projection",
                nn.initializers.xavier_uniform(),
                (cfg.num_seg_tokens, d),
                jnp.float32,
            )
        self.layernorm_embedding = ln()
        self.embed_positions = nn.Embed(cfg.max_target_positions + 2, d, param_dtype=jnp.float32)
        self.embed_image_positions = nn.Embed(cfg.image_bucket_size**2 + 1, d, param_dtype=jnp.float32)
        self.embed_seg_positions = nn.Embed(cfg.seg_bucket_size**2 + 1, d, param_dtype=jnp.float32)
        self.pos_ln = ln()
        self.image_pos_ln = ln()
        self.seg_pos_ln = ln()
        self.self_pos_q_linear = nn.Dense(d, param_dtype=jnp.float32, dtype=jnp.float32)
        self.self_pos_k_linear = nn.Dense(d, param_dtype=jnp.float32, dtype=jnp.float32)
        self.cross_pos_q_linear = nn.Dense(d, param_dtype=jnp.float32, dtype=jnp.float32)
        self.cross_pos_k_linear = nn.Dense(d, param_dtype=jnp.float32, dtype=jnp.float32)

        heads = cfg.decoder_attention_heads
        nlayers = cfg.decoder_layers
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
        sb = cfg.seg_bucket_size
        self.seg_rel_pos_table = self.param(
            "seg_rel_pos_table",
            nn.initializers.zeros,
            (nlayers, (2 * sb - 1) * (2 * sb - 1) + 3, heads),
            jnp.float32,
        )
        dpr = np.linspace(0, cfg.decoder_drop_path_rate, nlayers)
        # causal + deterministic (last two call args) are static under remat
        layer_cls = (
            nn.remat(
                DecoderLayer, static_argnums=(7, 8), policy=_remat_policy(cfg)
            )
            if cfg.checkpoint_activations
            else DecoderLayer
        )
        self.layers = [
            layer_cls(
                embed_dim=d,
                ffn_dim=cfg.decoder_ffn_embed_dim,
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
        if cfg.decoder_prompt:
            from .layers import PromptEncoder

            self.prompt_encoder = PromptEncoder(
                length=cfg.decoder_prompt_length,
                embed_dim=d,
                num_layers=nlayers,
                num_heads=heads,
                projection=cfg.decoder_prompt_projection,
                proj_dim=cfg.decoder_prompt_dim,
                name="prompt_encoder",
            )

    def _prompt_kv_all(self, deterministic: bool):
        """(layers, 2, H, P, dh) decoder prefix KV or None
        (decoder_module.py:501-510)."""
        if self.cfg.decoder_prompt and self.cfg.decoder_prompt_type == "prefix":
            return self.prompt_encoder(deterministic)
        return None

    def _pos_scaling(self) -> float:
        cfg = self.cfg
        return (
            float(
                cfg.decoder_embed_dim
                / cfg.decoder_attention_heads
                * cfg.attn_scale_factor
            )
            ** -0.5
        )

    def _bias(self, q_pos, k_pos, q_linear, k_linear) -> jnp.ndarray:
        heads = self.cfg.decoder_attention_heads
        lq, lk = q_pos.shape[0], k_pos.shape[0]
        q = (q_linear(q_pos) * self._pos_scaling()).reshape(lq, heads, -1)
        k = k_linear(k_pos).reshape(lk, heads, -1)
        return jnp.einsum("qhd,khd->hqk", q, k, preferred_element_type=jnp.float32)

    def _seg_pos_embed(self, h: int, w: int) -> jnp.ndarray:
        """(1 + h*w, D): BOS slot then the seg grid, interpolated from the
        seg-bucket grid when (h, w) differs (decoder_module.py:541-550)."""
        sb = self.cfg.seg_bucket_size
        grid_ids = (
            np.arange(sb, dtype=np.int64)[None, :]
            + np.arange(sb, dtype=np.int64)[:, None] * sb
            + 1
        ).reshape(-1)
        pe = self.embed_seg_positions(jnp.asarray(grid_ids))  # (sb*sb, D)
        if (h, w) != (sb, sb):
            pe = resize_bilinear(pe.reshape(sb, sb, -1), (h, w), h_axis=0, w_axis=1)
            pe = pe.reshape(h * w, -1)
        bos = self.embed_seg_positions(jnp.asarray([0]))
        return jnp.concatenate([bos, pe], axis=0)

    def __call__(
        self,
        bos_tokens,  # (B, 1) — prev_output_tokens[:, :1]
        encoder_out: Dict[str, Any],
        full_context_alignment: bool = False,
        features_only: bool = False,
        deterministic: bool = True,
    ):
        cfg = self.cfg
        h, w = encoder_out["image_embed_shape"]
        hw = h * w
        enc = encoder_out["encoder_out"]  # (B, L, D)
        valid_hw = encoder_out.get("valid_hw")  # padded-eval: traced (hp, wp)

        if cfg.decoder_input_type == "encoder_output":
            image_feats = enc[:, :hw]
        elif cfg.decoder_input_type == "encoder_input":
            image_feats = encoder_out["image_embed_before_scale"]
        else:
            raise ValueError(cfg.decoder_input_type)

        x = jnp.concatenate(
            [self.embed_tokens(bos_tokens).astype(cfg_dtype(cfg)), image_feats], axis=1
        )  # (B, 1+hw, D)
        if cfg.layernorm_embedding:
            x = self.layernorm_embedding(x).astype(cfg_dtype(cfg))
        if cfg.dropout > 0:
            x = self.dropout_layer(x, deterministic=deterministic)

        sb = cfg.seg_bucket_size
        if valid_hw is None:
            tgt_pos = self._seg_pos_embed(h, w)  # (1+hw, D)
            ah = aw = None
        else:
            # dynamic-valid interpolation of the seg-grid positional table
            # (decoder_module.py:541-550 under padded static shapes)
            hp, wp = valid_hw
            ah = bilinear_matrix_dyn(sb, h, hp)
            aw = bilinear_matrix_dyn(sb, w, wp)
            grid_ids = (
                np.arange(sb, dtype=np.int64)[None, :]
                + np.arange(sb, dtype=np.int64)[:, None] * sb
                + 1
            ).reshape(-1)
            pe = self.embed_seg_positions(jnp.asarray(grid_ids)).reshape(sb, sb, -1)
            pe = jnp.einsum("Hi,ijd->Hjd", ah, pe.astype(jnp.float32))
            pe = jnp.einsum("Wj,Hjd->HWd", aw, pe).reshape(hw, -1)
            bos_pe = self.embed_seg_positions(jnp.asarray([0])).astype(jnp.float32)
            tgt_pos = jnp.concatenate([bos_pe, pe], axis=0)

        tgt_pos_ln = self.seg_pos_ln(tgt_pos)
        self_bias0 = self._bias(
            tgt_pos_ln, tgt_pos_ln, self.self_pos_q_linear, self.self_pos_k_linear
        )
        src_pos = encoder_out["position_embeddings"]  # (L_enc, D), post pos-LN
        cross_bias = self._bias(
            tgt_pos_ln, src_pos, self.cross_pos_q_linear, self.cross_pos_k_linear
        ).astype(cfg_dtype(cfg))

        seg_bucket = make_image_bucket_position(sb, (2 * sb - 1) * (2 * sb - 1) + 3)

        self_padding_mask = None
        if valid_hw is not None:
            grid_valid = encoder_out["grid_valid"]  # (hw,)
            b = x.shape[0]
            self_padding_mask = jnp.broadcast_to(
                jnp.concatenate([jnp.zeros((1,), bool), ~grid_valid])[None, :],
                (b, 1 + hw),
            )

        enc_pad = encoder_out["encoder_padding_mask"]
        # structure-aware backward: the (1+sb²)² seg-bias gather's scatter-add
        # transpose was ~20 ms/step of sort-based reduction at 512px.  On the
        # identity-interp path the expansion is emitted in compute dtype
        # (exact; halves the (nl, H, L, L) fp32 HBM round-trip — see
        # position.gather_grid_bias_all_layers); fp32 when interp follows
        ident_interp = valid_hw is None and (sb, sb) == (h, w)
        seg_all = gather_grid_bias_all_layers(
            self.seg_rel_pos_table, seg_bucket, (sb, sb), bos=True,
            dtype=cfg_dtype(cfg) if ident_interp else jnp.float32,
        )
        prompt_all = self._prompt_kv_all(deterministic)

        def self_bias_fn(i):
            seg_b = seg_all[i]
            if valid_hw is None:
                seg_b = interp_seg_bias_with_bos(seg_b, (sb, sb), (h, w))
            else:
                seg_b = interp_seg_bias_with_bos_mats(seg_b, ah, aw, (sb, sb))
            return (self_bias0 + seg_b).astype(cfg_dtype(cfg))

        pp = getattr(self.plan, "pipeline_parallel", 1) if self.plan else 1
        if pp > 1 and not self.is_initializing():
            if cfg.decoder_layerdrop > 0:
                # see Encoder: the scanned PP stage body has no stochastic
                # whole-layer skip
                raise NotImplementedError(
                    "--decoder-layerdrop is not supported with "
                    "--pipeline-parallel"
                )
            x = self._run_layers_pp(
                x, enc, enc_pad, self_bias_fn, cross_bias, prompt_all,
                not full_context_alignment, deterministic,
                self_padding_mask=self_padding_mask,
            )
        else:
            # all-layer self-bias pack in one fused add (see Encoder
            # _run_layers): identity seg interpolation at the native 32x32
            # grid makes the pack a single (nl, H, L, L) broadcast-add
            nl = len(self.layers)
            if ident_interp:
                seg_interp_all = seg_all
            else:
                seg_interp_all = jnp.stack([
                    interp_seg_bias_with_bos(seg_all[i], (sb, sb), (h, w))
                    if valid_hw is None
                    else interp_seg_bias_with_bos_mats(seg_all[i], ah, aw, (sb, sb))
                    for i in range(nl)
                ])
            # components cast before the add so the (nl, H, L, L) tree runs
            # in compute dtype end-to-end (see Encoder _run_layers)
            pack = (
                self_bias0[None].astype(cfg_dtype(cfg))
                + seg_interp_all.astype(cfg_dtype(cfg))
            )
            for i, layer in enumerate(self.layers):
                y = layer(
                    x, enc, enc_pad, pack[i], cross_bias,
                    self_padding_mask, not full_context_alignment, deterministic,
                    prompt_all[i] if prompt_all is not None else None,
                )
                x = _layerdrop(self, cfg.decoder_layerdrop, deterministic, y, x)
        x = self.layer_norm(x).astype(cfg_dtype(cfg))
        if features_only:
            return x
        return self.output_layer(x)

    def _run_layers_pp(
        self, x, enc, enc_pad, self_bias_fn, cross_bias, prompt_all,
        causal, deterministic, self_padding_mask=None,
    ):
        """GPipe over the decoder layer stack (--pipeline-parallel); the
        encoder context and padding masks are per-microbatch constants each
        stage reads locally (parallel/pipeline.py mb_consts) — only the
        activations rotate.  See Encoder._run_layers_pp for the scheme."""
        import jax.random as jrandom

        from ifseg_tpu.parallel.pipeline import gpipe

        cfg = self.cfg
        plan = self.plan
        nl = len(self.layers)
        s = plan.pipeline_parallel
        assert nl % s == 0, f"{nl} layers not divisible by {s} pipeline stages"
        lps = nl // s
        m = plan.chunks
        if cfg.decoder_drop_path_rate > 0 and not deterministic:
            logger.warning(
                "--pipeline-parallel disables decoder stochastic depth "
                "(drop_path_rate=%.2f ignored)", cfg.decoder_drop_path_rate,
            )

        biases = jnp.stack([self_bias_fn(i) for i in range(nl)])
        layer_params = [
            self.variables["params"][f"layers_{i}"] for i in range(nl)
        ]
        stacked = jax.tree_util.tree_map(lambda *ps: jnp.stack(ps), *layer_params)
        stage_params = jax.tree_util.tree_map(
            lambda a: a.reshape(s, lps, *a.shape[1:]), stacked
        )
        consts = {"bias": biases.reshape(s, lps, *biases.shape[1:])}
        if prompt_all is not None:
            consts["prompt"] = prompt_all.reshape(s, lps, *prompt_all.shape[1:])

        bcast = {"cross_bias": cross_bias}
        if not deterministic and (
            cfg.dropout > 0 or cfg.attention_dropout > 0
            or cfg.activation_dropout > 0
        ):
            bcast["rng"] = self.make_rng("dropout")

        layer_mod = DecoderLayer(
            embed_dim=cfg.decoder_embed_dim,
            ffn_dim=cfg.decoder_ffn_embed_dim,
            num_heads=cfg.decoder_attention_heads,
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
            # mbrow: this microbatch's encoder context + masks, read locally
            ee, ep = mbrow["enc"], mbrow["enc_pad"]
            sp = mbrow.get("self_pad")
            stage_idx = jax.lax.axis_index(plan.axis)

            def body(carry, inp):
                j, p_l, c_l = inp
                rngs = None
                if "rng" in bc:
                    key = jrandom.fold_in(bc["rng"], stage_idx * 4096 + j)
                    rngs = {"dropout": jrandom.fold_in(key, mb)}
                y = layer_mod.apply(
                    {"params": p_l}, carry, ee, ep, c_l["bias"],
                    bc["cross_bias"], sp, causal, deterministic,
                    c_l.get("prompt"), rngs=rngs,
                )
                return y, None

            xx, _ = jax.lax.scan(body, xx, (jnp.arange(lps), p_stage, c_stage))
            return xx

        mb_consts = {"enc": enc, "enc_pad": enc_pad}
        if self_padding_mask is not None:
            mb_consts["self_pad"] = self_padding_mask
        return gpipe(
            stage_params, stage_fn, x, plan.mesh,
            axis=plan.axis, stage_consts=consts, bcast=bcast,
            mb_consts=mb_consts, chunks=m,
        )

    def precompute_biases(self, enc_pos_all, image_hw):
        """Batch-independent decoder bias pack for a fixed shape (serving):
        self bias (abs + per-layer seg rel) and the cross bias to a fixed
        encoder layout."""
        cfg = self.cfg
        h, w = image_hw
        sb = cfg.seg_bucket_size
        tgt_pos = self._seg_pos_embed(h, w)
        tgt_pos_ln = self.seg_pos_ln(tgt_pos)
        self_bias0 = self._bias(
            tgt_pos_ln, tgt_pos_ln, self.self_pos_q_linear, self.self_pos_k_linear
        )
        cross_bias = self._bias(
            tgt_pos_ln, enc_pos_all, self.cross_pos_q_linear, self.cross_pos_k_linear
        )
        seg_bucket = make_image_bucket_position(sb, (2 * sb - 1) * (2 * sb - 1) + 3)
        # structure-aware backward: the (1+sb²)² seg-bias gather's scatter-add
        # transpose was ~20 ms/step of sort-based reduction at 512px
        seg_all = gather_grid_bias_all_layers(
            self.seg_rel_pos_table, seg_bucket, (sb, sb), bos=True
        )
        self_biases = []
        for i in range(len(self.layers)):
            seg_b = interp_seg_bias_with_bos(seg_all[i], (sb, sb), (h, w))
            self_biases.append((self_bias0 + seg_b).astype(cfg_dtype(cfg)))
        return {
            "self_biases": jnp.stack(self_biases),
            "cross_bias": cross_bias.astype(cfg_dtype(cfg)),
        }

    def decode_served(
        self, bos_tokens, encoder_out, pre, full_context_alignment=False,
        deterministic=True,
    ):
        """Surrogate decode with precomputed biases (inference fast path)."""
        cfg = self.cfg
        h, w = encoder_out["image_embed_shape"]
        hw = h * w
        enc = encoder_out["encoder_out"]
        if cfg.decoder_input_type == "encoder_output":
            image_feats = enc[:, :hw]
        else:
            image_feats = encoder_out["image_embed_before_scale"]
        x = jnp.concatenate(
            [self.embed_tokens(bos_tokens).astype(cfg_dtype(cfg)), image_feats], axis=1
        )
        if cfg.layernorm_embedding:
            x = self.layernorm_embedding(x).astype(cfg_dtype(cfg))
        enc_pad = encoder_out["encoder_padding_mask"]
        for i, layer in enumerate(self.layers):
            x = layer(
                x, enc, enc_pad, pre["self_biases"][i], pre["cross_bias"],
                None, not full_context_alignment, deterministic,
            )
        x = self.layer_norm(x).astype(cfg_dtype(cfg))
        return self.output_layer(x)

    def decode_ar(
        self,
        prev_tokens,  # (B, L) generated ids
        encoder_out: Dict[str, Any],
        embed_mode: str = "seg",  # 'seg': ids are class ids -> seg_embed rows
        deterministic: bool = True,
    ):
        """Classic autoregressive decode (decoder_module.py:680-862), full
        causal recompute (no KV cache; the surrogate pass is the seg hot path
        — the reference's AR path cannot even embed <seg_k>, k>0: the token
        embedding excludes seg rows, unify_transformer.py:400-411 — so this
        exists for generator/capability parity, not the seg metric path).

        ``embed_mode='seg'`` embeds generated class ids via seg_embed_tokens
        (self-consistent with the tied seg head); ``'vocab'`` uses the token
        embedding (OFA text generation).
        Returns (B, L, num_seg) logits.
        """
        cfg = self.cfg
        b, l = prev_tokens.shape
        if embed_mode == "seg":
            bos_emb = self.embed_tokens(prev_tokens[:, :1])
            rest = jnp.take(
                self.seg_embed_tokens,
                jnp.clip(prev_tokens[:, 1:], 0, cfg.num_seg_tokens - 1),
                axis=0,
            )
            x = jnp.concatenate([bos_emb, rest], axis=1).astype(cfg_dtype(cfg))
        else:
            x = self.embed_tokens(prev_tokens).astype(cfg_dtype(cfg))
        if cfg.layernorm_embedding:
            x = self.layernorm_embedding(x).astype(cfg_dtype(cfg))
        if cfg.dropout > 0:
            x = self.dropout_layer(x, deterministic=deterministic)

        # text positions + token relative bias (ref :816-819)
        tgt_pos = self.pos_ln(self.embed_positions(jnp.arange(l)))
        self_bias0 = self._bias(
            tgt_pos, tgt_pos, self.self_pos_q_linear, self.self_pos_k_linear
        )
        src_pos = encoder_out["position_embeddings"]
        cross_bias = self._bias(
            tgt_pos, src_pos, self.cross_pos_q_linear, self.cross_pos_k_linear
        ).astype(cfg_dtype(cfg))
        from .position import make_token_bucket_position

        token_bucket = make_token_bucket_position(cfg.token_bucket_size)[:l, :l]
        tok_all = gather_rel_bias_all_layers(self.token_rel_pos_table, token_bucket)

        enc = encoder_out["encoder_out"]
        enc_pad = encoder_out["encoder_padding_mask"]
        prompt_all = self._prompt_kv_all(deterministic)
        for i, layer in enumerate(self.layers):
            x = layer(
                x, enc, enc_pad,
                (self_bias0 + tok_all[i]).astype(cfg_dtype(cfg)),
                cross_bias,
                None, True, deterministic,
                prompt_all[i] if prompt_all is not None else None,
            )
        x = self.layer_norm(x).astype(cfg_dtype(cfg))
        return self.output_layer(x)

    def output_layer(self, features):
        """seg head: (B, L, D) -> (B, L, num_seg) (decoder_module.py:290-294)."""
        w = (
            self.seg_embed_tokens
            if self.cfg.tie_seg_projection
            else self.seg_projection
        )
        return jnp.einsum(
            "bld,cd->blc",
            features.astype(jnp.float32),
            w.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
