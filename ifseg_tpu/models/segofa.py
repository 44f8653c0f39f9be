"""SegOFA model assembly (mirrors models/segofa/segofa.py + unify_transformer.py).

One shared token embedding feeds encoder and decoder (share_all_embeddings);
`seg_embed_tokens` lives in the decoder and is shared with the encoder's
lazy-init path through the criterion.  Forward routes the main input through
encoder+decoder and `aux_input` (artificial image) through the artificial
encoder path (segofa.py:69-153).
"""

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ifseg_tpu.config import ModelConfig
from .decoder import Decoder
from .encoder import Encoder, cfg_dtype


class SegOFA(nn.Module):
    cfg: ModelConfig
    # model-parallel strategies beyond GSPMD (PP/EP/CP), None = pure GSPMD
    plan: Optional[object] = None  # ifseg_tpu.parallel.plan.ParallelPlan

    def setup(self):
        cfg = self.cfg
        self.embed_tokens = nn.Embed(
            cfg.vocab_size,
            cfg.encoder_embed_dim,
            embedding_init=nn.initializers.normal(stddev=cfg.encoder_embed_dim**-0.5),
            param_dtype=jnp.float32,
            name="embed_tokens",
        )
        self.encoder = Encoder(cfg, self.embed_tokens, plan=self.plan, name="encoder")
        self.decoder = Decoder(cfg, self.embed_tokens, plan=self.plan, name="decoder")

    def __call__(
        self,
        src_tokens=None,  # (B, T)
        patch_images=None,  # (B, H, W, 3)
        patch_masks=None,  # (B,)
        bos_tokens=None,  # (B, 1)
        aux_grid_ids=None,  # (B, hw) — artificial image class grid
        aux_src_tokens=None,  # (B, T)
        class_tokens=None,  # (C, Tname)
        class_lengths=None,  # (C,)
        full_context_alignment: bool = False,
        deterministic: bool = True,
    ):
        """Returns (logits, extra).  Main branch runs iff src_tokens is not
        None; aux (image-free) branch runs iff aux_grid_ids is not None."""
        logits = None
        extra: Dict[str, Any] = {}
        if src_tokens is not None:
            enc = self.encoder.encode(
                src_tokens, patch_images, patch_masks, deterministic=deterministic
            )
            logits = self.decoder(
                bos_tokens,
                enc,
                full_context_alignment=full_context_alignment,
                deterministic=deterministic,
            )
            extra["encoder_returns"] = enc
        if aux_grid_ids is not None:
            aux_enc = self.encoder.encode_artificial(
                aux_src_tokens,
                aux_grid_ids,
                class_tokens,
                class_lengths,
                deterministic=deterministic,
            )
            aux_logits = self.decoder(
                bos_tokens if bos_tokens is not None else jnp.zeros(
                    (aux_grid_ids.shape[0], 1), jnp.int32
                ),
                aux_enc,
                full_context_alignment=full_context_alignment,
                deterministic=deterministic,
            )
            extra["aux_output"] = aux_logits
            extra["aux_encoder_returns"] = aux_enc
        return logits, extra

    def encode_only(self, src_tokens, patch_images, patch_masks=None, deterministic=True):
        return self.encoder.encode(src_tokens, patch_images, patch_masks, deterministic)

    def eval_forward(
        self,
        src_tokens,  # (B, T)
        patch_images,  # (B, Hb, Wb, 3) zero-padded to a shape bucket
        img_h,  # traced valid height
        img_w,  # traced valid width
        bos_tokens,  # (B, 1)
        full_context_alignment: bool = False,
    ):
        """Native-resolution eval forward (padded static shapes; see
        Encoder.encode_padded).  Returns (logits (B, 1+HpWp, C), encoder_out)."""
        enc = self.encoder.encode_padded(
            src_tokens, patch_images, img_h, img_w, deterministic=True
        )
        logits = self.decoder(
            bos_tokens,
            enc,
            full_context_alignment=full_context_alignment,
            deterministic=True,
        )
        return logits, enc


def build_generator(
    model: SegOFA,
    params,
    encoder_out,
    beam: int = 5,
    max_len: int = 1024,
    min_len: int = 1024,
    no_repeat_ngram_size: int = 0,
    use_kv_cache: bool = True,
    constraint_trie=None,
    constraint_range=None,
    zero_shot: bool = False,
    lexical_constraints=None,
):
    """Build a beam-search generator over the AR decode path (parity with
    OFATask.build_generator, tasks/ofa_task.py:187-313; the seg eval_args pin
    max_len == min_len, run_scripts --eval-args).

    ``params`` may be a list/tuple of parameter pytrees: the generator then
    averages the models' next-token distributions in probability space
    (EnsembleModel, models/sequence_generator.py:899-900).

    With ``use_kv_cache`` each step attends over cached keys/values (O(L) per
    step, models/ar_cache.py — the incremental_state analog); otherwise the
    step recomputes the causal prefix (Decoder.decode_ar)."""
    from ifseg_tpu.generate.sequence_generator import (
        SequenceGenerator,
        ensemble_step_fn,
    )

    if isinstance(params, (list, tuple)) and len(params) > 1:
        gens = [
            build_generator(
                model, p, encoder_out, beam=beam, max_len=max_len,
                min_len=min_len, no_repeat_ngram_size=no_repeat_ngram_size,
                use_kv_cache=use_kv_cache, constraint_trie=constraint_trie,
                constraint_range=constraint_range, zero_shot=zero_shot,
                lexical_constraints=lexical_constraints,
            )
            for p in params
        ]
        ens = gens[0]
        ens.step_fn = ensemble_step_fn([g.step_fn for g in gens])
        ens.initial_cache = tuple(
            getattr(g, "initial_cache", ()) for g in gens
        )
        return ens
    if isinstance(params, (list, tuple)):
        params = params[0]

    # tile batched encoder outputs across the beam (the generator's step sees
    # bsz*beam rows; EnsembleModel.reorder_encoder_out analog)
    bsz = encoder_out["encoder_out"].shape[0]

    def tile(x):
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] == bsz:
            return jnp.repeat(x, beam, axis=0)
        return x

    enc_tiled = {
        k: tile(v) if not isinstance(v, tuple) else v
        for k, v in encoder_out.items()
    }

    # The generator's vocab here is compact class ids [0, num_seg) — the
    # dictionary specials (pad=1/eos=2/unk=3) are CLASS ids in this space and
    # must not get special treatment (class 1 would be banned, class 2 would
    # terminate hypotheses).  Append two synthetic columns instead:
    #   col num_seg     = EOS (logit -1e4: never competitive, but decisively
    #                     above the -1e9 force-mask at the final step)
    #   col num_seg + 1 = pad/unk (always banned)
    num_seg = model.cfg.num_seg_tokens
    specials = dict(pad=num_seg + 1, eos=num_seg, unk=num_seg + 1, bos=0)

    def _pad_logits(logits):
        b = logits.shape[0]
        cols = jnp.full((b, 2), -1e4, logits.dtype).at[:, 1].set(-1e9)
        return jnp.concatenate([logits, cols], axis=-1)

    if use_kv_cache:
        from ifseg_tpu.models.ar_cache import ar_step, init_ar_cache

        cache0 = init_ar_cache(
            model.cfg, params, enc_tiled, bsz * beam, max_len + 2
        )

        def step_fn(tokens, step, cache):
            logits, cache = ar_step(model.cfg, params, cache, tokens, step)
            return _pad_logits(logits), cache

        gen = SequenceGenerator(
            step_fn,
            vocab_size=num_seg + 2,
            beam_size=beam,
            **specials,
            max_len=max_len,
            min_len=min_len,
            no_repeat_ngram_size=no_repeat_ngram_size,
            constraint_trie=constraint_trie,
            constraint_range=constraint_range,
            zero_shot=zero_shot,
            lexical_constraints=lexical_constraints,
        )
        gen.initial_cache = cache0
        return gen

    def step_fn(tokens, step, cache):
        logits = model.apply(
            {"params": params},
            tokens,
            enc_tiled,
            method=lambda m, t, e: m.decoder.decode_ar(t, e),
        )
        idx = jnp.minimum(step, tokens.shape[1] - 1)
        return _pad_logits(logits[:, idx]), cache

    return SequenceGenerator(
        step_fn,
        vocab_size=num_seg + 2,
        beam_size=beam,
        **specials,
        max_len=max_len,
        min_len=min_len,
        no_repeat_ngram_size=no_repeat_ngram_size,
        constraint_trie=constraint_trie,
        constraint_range=constraint_range,
        zero_shot=zero_shot,
        lexical_constraints=lexical_constraints,
    )


class SegOFAVariables:
    """Helper to init / describe SegOFA parameter pytrees."""

    @staticmethod
    def init(cfg: ModelConfig, rng: jax.Array, src_len: int = 48, image_size: int = 64,
             plan=None):
        model = SegOFA(cfg, plan=plan)
        hw = (cfg.patch_image_size // 16) ** 2
        dummy = dict(
            src_tokens=jnp.zeros((1, src_len), jnp.int32),
            patch_images=jnp.zeros((1, image_size, image_size, 3), jnp.float32),
            patch_masks=jnp.ones((1,), bool),
            bos_tokens=jnp.zeros((1, 1), jnp.int32),
            aux_grid_ids=jnp.zeros((1, hw), jnp.int32),
            aux_src_tokens=jnp.zeros((1, src_len), jnp.int32),
            class_tokens=jnp.zeros((cfg.num_seg_tokens + 1, 4), jnp.int32),
            class_lengths=jnp.ones((cfg.num_seg_tokens + 1,), jnp.int32),
        )

        def init_all(m: SegOFA, kw):
            # exercise surrogate + AR paths so lazily-created submodules
            # (decoder.embed_positions etc.) materialize their params
            logits, extra = m(**kw)
            enc = extra["encoder_returns"]
            _ = m.decoder.decode_ar(jnp.zeros((1, 2), jnp.int32), enc)
            return logits

        init_fn = jax.jit(
            lambda rng, kw: model.init({"params": rng}, kw, method=init_all)
        )
        variables = init_fn(rng, dummy)
        return model, variables["params"]
