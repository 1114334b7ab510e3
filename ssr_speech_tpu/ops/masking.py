"""Attention/padding mask construction for the [text ; codec] joint sequence.

Mirrors the reference mask semantics (``models/ssr.py:214-255``,
``models/modules/utils.py:5-30``): text queries attend causally within the
text block and never to audio; audio queries attend to all text and causally
within audio; padded keys are masked everywhere.
"""

from __future__ import annotations

import jax.numpy as jnp

NEG_INF = -1e9


def make_pad_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """[B] lengths -> [B, max_len] bool, True at padding positions.

    Matches reference ``make_pad_mask`` (``models/modules/utils.py:5``).
    """
    pos = jnp.arange(max_len)[None, :]
    return pos >= lengths[:, None]


def xy_attn_bias(
    x_lens: jnp.ndarray,
    y_lens: jnp.ndarray,
    sx: int,
    sy: int,
) -> jnp.ndarray:
    """Additive attention bias [B, 1, Sx+Sy, Sx+Sy] for the joint sequence.

    Layout per reference ``dec_forward`` (``models/ssr.py:227-255``):
      - rows 0..Sx-1 (text): causal over text, all-audio banned;
      - rows Sx.. (audio): full text visibility, causal over audio;
      - padded keys banned for every query.
    """
    s = sx + sy
    idx = jnp.arange(s)
    is_y_row = idx >= sx
    is_y_col = idx[None, :] >= sx
    tri = idx[None, :] > idx[:, None]  # strictly-future ban (causal)
    # [S, S] structural mask: causal everywhere, and text rows ban all audio cols
    banned = jnp.logical_or(tri, (~is_y_row)[:, None] & is_y_col)
    # padding: key j banned if padded
    x_pad = make_pad_mask(x_lens, sx)  # [B, sx]
    y_pad = make_pad_mask(y_lens, sy)  # [B, sy]
    key_pad = jnp.concatenate([x_pad, y_pad], axis=1)  # [B, S]
    full = banned[None, :, :] | key_pad[:, None, :]
    return jnp.where(full, NEG_INF, 0.0)[:, None, :, :].astype(jnp.float32)
