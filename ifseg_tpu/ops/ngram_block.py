"""No-repeat-ngram masking, vectorized (replaces the reference CUDA kernel
clib/cuda/ngram_repeat_block_cuda.cpp + fairseq/ngram_repeat_block.py).

Given generated prefixes, ban every token that would complete an n-gram
already present in the prefix.  Pure jnp over static shapes, so it fuses into
the generation step instead of being a separate kernel launch.
"""

import jax.numpy as jnp


def ngram_repeat_mask(tokens, step, ngram_size: int, vocab_size: int):
    """tokens: (N, L) generated ids (positions > step are garbage);
    step: current position (the next token will be written at step+1).
    Returns (N, V) bool — True where the token is banned.
    """
    n, l = tokens.shape
    if ngram_size <= 0 or l < ngram_size:
        return jnp.zeros((tokens.shape[0], vocab_size), bool)
    k = ngram_size - 1

    # current suffix: the last k tokens ending at `step`
    pos = jnp.arange(l)
    suffix_sel = (pos > step - k) & (pos <= step)  # k positions
    # windows: for each start j, the k tokens [j, j+k) and the follower at j+k
    idx = jnp.arange(l - k)
    windows = jnp.stack([tokens[:, idx + i] for i in range(k)], axis=-1)  # (N, L-k, k)
    followers = tokens[:, idx + k]  # (N, L-k)
    # suffix as (N, k)
    suffix = jnp.stack(
        [tokens[:, jnp.clip(step - k + 1 + i, 0, l - 1)] for i in range(k)], axis=-1
    )
    match = jnp.all(windows == suffix[:, None, :], axis=-1)  # (N, L-k)
    # only windows fully inside the generated prefix (follower index <= step)
    valid = (idx + k) <= step
    match = match & valid[None, :]
    banned = jnp.zeros((n, vocab_size), bool)
    follow_clipped = jnp.clip(followers, 0, vocab_size - 1)
    banned = banned.at[jnp.arange(n)[:, None], follow_clipped].max(match)
    return banned
