"""Pre-LN transformer layers with the OFA extras.

Mirrors models/segofa/unify_transformer_layer.py: attn_ln after self-attention
("scale_attn"), ffn_layernorm between the FFN matmuls ("scale_fc"), optional
w_resid residual scaling ("scale_resids"), DropPath stochastic depth, GELU.
"""

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from .attention import MultiheadAttention


def drop_path(x, rate: float, deterministic: bool, rng=None):
    """Stochastic depth, dropped per sample (unify_transformer_layer.py:19-35)."""
    if rate == 0.0 or deterministic:
        return x
    keep = 1.0 - rate
    # reference drops per batch element: shape (1, B, 1) in T-major == (B, 1, 1) here
    mask_shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jnp.floor(keep + jax.random.uniform(rng, mask_shape, x.dtype))
    return x / keep * mask


class DropPath(nn.Module):
    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        return drop_path(x, self.rate, deterministic, self.make_rng("dropout"))


def _ln(name):
    return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32, name=name)


class Adapter(nn.Module):
    """Bottleneck adapter (unify_transformer_layer.py:49-94 Adapter_Layer):
    x + up_proj(relu(down_proj(x))), applied to the FFN output before the
    residual add.  BERT-style init (N(0, 0.02) kernels, zero bias)."""

    embed_dim: int
    down_size: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        init = nn.initializers.normal(stddev=0.02)
        down = nn.Dense(
            self.down_size, kernel_init=init, dtype=self.dtype,
            param_dtype=jnp.float32, name="down_proj",
        )(x)
        down = nn.relu(down)
        if self.dropout > 0.0:
            down = nn.Dropout(self.dropout)(down, deterministic=deterministic)
        up = nn.Dense(
            self.embed_dim, kernel_init=init, dtype=self.dtype,
            param_dtype=jnp.float32, name="up_proj",
        )(down)
        return x + up


class PromptEncoder(nn.Module):
    """Prefix-tuning prompt generator (encoder_module.py:989-1027 +
    get_encoder_prompt :374-386): a learned table of per-layer key/value
    prefixes.  The reference expands identical ``arange(P)`` prompt ids across
    the batch; the prefix is therefore batch-independent, computed once as
    (layers, 2, heads, P, head_dim) and broadcast inside attention."""

    length: int
    embed_dim: int
    num_layers: int
    num_heads: int
    projection: bool = False
    proj_dim: int = 0  # 0 -> 2 * embed_dim
    dropout: float = 0.2  # ref encoder_dropout p=0.2 on past_key_values

    @nn.compact
    def __call__(self, deterministic: bool = True):
        ids = jnp.arange(self.length)
        out_dim = self.num_layers * 2 * self.embed_dim
        if self.projection:
            x = nn.Embed(self.length, self.embed_dim, param_dtype=jnp.float32,
                         name="embedding")(ids)
            proj = self.proj_dim or 2 * self.embed_dim
            x = nn.Dense(proj, param_dtype=jnp.float32, name="trans_0")(x)
            x = nn.relu(x)
            x = nn.Dense(out_dim, param_dtype=jnp.float32, name="trans_2")(x)
        else:
            x = nn.Embed(self.length, out_dim, param_dtype=jnp.float32,
                         name="embedding")(ids)
        if self.dropout > 0.0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        head_dim = self.embed_dim // self.num_heads
        x = x.reshape(self.length, self.num_layers * 2, self.num_heads, head_dim)
        # (P, 2L, H, dh) -> (2L, H, P, dh) -> (L, 2, H, P, dh)
        x = x.transpose(1, 2, 0, 3)
        return x.reshape(self.num_layers, 2, self.num_heads, self.length, head_dim)


class FeedForward(nn.Module):
    embed_dim: int
    ffn_dim: int
    activation_fn: str = "gelu"
    dropout: float = 0.0
    activation_dropout: float = 0.0
    scale_fc: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.activation_fn in ("gelu", "gelu_exact"):
            # fairseq's gelu is the exact erf form (torch F.gelu default);
            # flax nn.gelu defaults to the tanh approximation
            act = lambda v: nn.gelu(v, approximate=False)
        elif self.activation_fn == "gelu_poly":
            # bf16-faithful piecewise polynomial (ops/gelu.py): measured
            # SLOWER than erf inside the fc1 fusion on v5e (the branchless
            # piecewise costs more VPU ops than XLA's erf) — kept opt-in for
            # backends where erf is the bottleneck
            from ifseg_tpu.ops.gelu import gelu_poly

            act = gelu_poly
        elif self.activation_fn == "gelu_tanh":
            # opt-in speed knob: erf is not hardware-accelerated on the VPU
            # and costs ~1.1 ms per FFN at the 512px serving shape; the tanh
            # approximation fuses for free (README perf notes)
            act = lambda v: nn.gelu(v, approximate=True)
        else:
            act = getattr(nn, self.activation_fn)
        x = nn.Dense(self.ffn_dim, dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(x)
        x = act(x)
        # remat tag (encoder.py _remat_policy 'save-attn-ffn'): saving the
        # post-gelu activation skips the fc1 matmul + erf recompute in backward
        x = checkpoint_name(x, "ffn_act")
        if self.activation_dropout > 0.0:
            x = nn.Dropout(self.activation_dropout)(x, deterministic=deterministic)
        if self.scale_fc:
            x = _ln("ffn_layernorm")(x).astype(self.dtype)
        x = nn.Dense(self.embed_dim, dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(x)
        if self.dropout > 0.0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class EncoderLayer(nn.Module):
    embed_dim: int
    ffn_dim: int
    num_heads: int
    attn_scale_factor: float = 2.0
    scale_attn: bool = True
    scale_fc: bool = True
    scale_heads: bool = True
    scale_resids: bool = False
    activation_fn: str = "gelu"
    dropout: float = 0.0
    attention_dropout: float = 0.0
    activation_dropout: float = 0.0
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    use_adapter: bool = False
    adapter_dim: int = 200
    plan: object = None  # ParallelPlan: context-parallel self-attn, MoE FFN
    use_moe: bool = False

    @nn.compact
    def __call__(self, x, padding_mask=None, self_attn_bias=None, deterministic=True,
                 prompt_kv=None):
        residual = x
        y = _ln("self_attn_layer_norm")(x).astype(self.dtype)
        y = MultiheadAttention(
            self.embed_dim,
            self.num_heads,
            scale_factor=self.attn_scale_factor,
            scale_heads=self.scale_heads,
            dropout=self.attention_dropout,
            dtype=self.dtype,
            use_flash=self.use_flash,
            plan=self.plan,
            name="self_attn",
        )(y, bias=self_attn_bias, key_padding_mask=padding_mask,
          deterministic=deterministic, prompt_kv=prompt_kv)
        if self.scale_attn:
            y = _ln("attn_ln")(y).astype(self.dtype)
        if self.dropout > 0.0:
            y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        x = residual + DropPath(self.drop_path_rate)(y, deterministic)

        residual = x
        y = _ln("final_layer_norm")(x).astype(self.dtype)
        if self.use_moe:
            from .moe_ffn import MoEFeedForward

            y = MoEFeedForward(
                self.embed_dim, self.ffn_dim, self.plan, self.dtype, name="moe",
            )(y, deterministic)
        else:
            y = FeedForward(
                self.embed_dim, self.ffn_dim, self.activation_fn, self.dropout,
                self.activation_dropout, self.scale_fc, self.dtype, name="ffn",
            )(y, deterministic)
        if self.use_adapter:
            y = Adapter(
                self.embed_dim, self.adapter_dim, dtype=self.dtype, name="adapter"
            )(y, deterministic)
        if self.scale_resids:
            w_resid = self.param("w_resid", nn.initializers.ones, (self.embed_dim,), jnp.float32)
            residual = residual * w_resid.astype(residual.dtype)
        x = residual + DropPath(self.drop_path_rate)(y, deterministic)
        return x


class DecoderLayer(nn.Module):
    embed_dim: int
    ffn_dim: int
    num_heads: int
    attn_scale_factor: float = 2.0
    scale_attn: bool = True
    scale_fc: bool = True
    scale_heads: bool = True
    scale_resids: bool = False
    activation_fn: str = "gelu"
    dropout: float = 0.0
    attention_dropout: float = 0.0
    activation_dropout: float = 0.0
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    use_adapter: bool = False
    adapter_dim: int = 200
    plan: object = None
    use_moe: bool = False

    @nn.compact
    def __call__(
        self,
        x,
        encoder_out=None,
        encoder_padding_mask=None,
        self_attn_bias=None,
        cross_attn_bias=None,
        self_padding_mask=None,
        causal: bool = True,
        deterministic: bool = True,
        prompt_kv=None,
    ):
        residual = x
        y = _ln("self_attn_layer_norm")(x).astype(self.dtype)
        y = MultiheadAttention(
            self.embed_dim,
            self.num_heads,
            scale_factor=self.attn_scale_factor,
            scale_heads=self.scale_heads,
            dropout=self.attention_dropout,
            dtype=self.dtype,
            use_flash=self.use_flash,
            plan=self.plan,
            name="self_attn",
        )(
            y,
            bias=self_attn_bias,
            key_padding_mask=self_padding_mask,
            causal=causal,
            deterministic=deterministic,
            prompt_kv=prompt_kv,
        )
        if self.scale_attn:
            y = _ln("self_attn_ln")(y).astype(self.dtype)
        if self.dropout > 0.0:
            y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        x = residual + DropPath(self.drop_path_rate)(y, deterministic)

        if encoder_out is not None:
            residual = x
            y = _ln("encoder_attn_layer_norm")(x).astype(self.dtype)
            y = MultiheadAttention(
                self.embed_dim,
                self.num_heads,
                scale_factor=self.attn_scale_factor,
                scale_heads=self.scale_heads,
                dropout=self.attention_dropout,
                dtype=self.dtype,
                use_flash=self.use_flash,
                name="encoder_attn",
            )(
                y,
                key=encoder_out,
                bias=cross_attn_bias,
                key_padding_mask=encoder_padding_mask,
                deterministic=deterministic,
            )
            if self.scale_attn:
                y = _ln("cross_attn_ln")(y).astype(self.dtype)
            if self.dropout > 0.0:
                y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
            x = residual + DropPath(self.drop_path_rate)(y, deterministic)

        residual = x
        y = _ln("final_layer_norm")(x).astype(self.dtype)
        if self.use_moe:
            from .moe_ffn import MoEFeedForward

            y = MoEFeedForward(
                self.embed_dim, self.ffn_dim, self.plan, self.dtype, name="moe",
            )(y, deterministic)
        else:
            y = FeedForward(
                self.embed_dim, self.ffn_dim, self.activation_fn, self.dropout,
                self.activation_dropout, self.scale_fc, self.dtype, name="ffn",
            )(y, deterministic)
        if self.use_adapter:
            y = Adapter(
                self.embed_dim, self.adapter_dim, dtype=self.dtype, name="adapter"
            )(y, deterministic)
        if self.scale_resids:
            w_resid = self.param("w_resid", nn.initializers.ones, (self.embed_dim,), jnp.float32)
            residual = residual * w_resid.astype(residual.dtype)
        x = residual + DropPath(self.drop_path_rate)(y, deterministic)
        return x
