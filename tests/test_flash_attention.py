"""Flash-attention kernel parity vs the jnp reference implementation.

Runs in Pallas interpret mode on CPU; the same code path compiles with
Mosaic on TPU. Forward and VJP are checked against
``dot_product_attention`` for several (L, Dh) shapes including
non-multiples of the tile sizes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourierdiffusion_tpu.models.attention import dot_product_attention
from fourierdiffusion_tpu.ops.flash_attention import flash_attention


def _qkv(key, b, h, l, dh):
    ks = jax.random.split(key, 3)
    return tuple(jax.random.normal(k, (b, h, l, dh), jnp.float32) for k in ks)


@pytest.mark.parametrize("b,h,l,dh", [(2, 12, 187, 6), (1, 4, 24, 8), (3, 2, 128, 16), (2, 1, 365, 6)])
def test_forward_matches_reference(b, h, l, dh) -> None:
    q, k, v = _qkv(jax.random.PRNGKey(0), b, h, l, dh)
    out = flash_attention(q, k, v)
    ref = dot_product_attention(q, k, v)
    assert out.shape == (b, h, l, dh)
    # Tolerance covers TPU fp32 dots (bf16 passes on the MXU); a layout
    # or masking bug would show up as O(1) errors.
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


@pytest.mark.parametrize("b,h,l,dh", [(2, 3, 50, 6), (1, 2, 33, 12)])
def test_vjp_matches_reference(b, h, l, dh) -> None:
    q, k, v = _qkv(jax.random.PRNGKey(1), b, h, l, dh)
    do = jax.random.normal(jax.random.PRNGKey(2), (b, h, l, dh), jnp.float32)

    out_f, vjp_f = jax.vjp(flash_attention, q, k, v)
    out_r, vjp_r = jax.vjp(lambda q, k, v: dot_product_attention(q, k, v), q, k, v)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r), atol=2e-3)

    grads_f = vjp_f(do)
    grads_r = vjp_r(do)
    for gf, gr, name in zip(grads_f, grads_r, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=2e-2, err_msg=f"d{name}"
        )


def test_jit_and_grad_compose() -> None:
    q, k, v = _qkv(jax.random.PRNGKey(3), 2, 2, 40, 6)

    @jax.jit
    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v) ** 2)

    g = jax.jit(jax.grad(loss))(q, k, v)
    assert g.shape == q.shape
    assert bool(jnp.all(jnp.isfinite(g)))


def test_bf16_fast_path_matches_reference() -> None:
    """The max-free bf16 fast path (clamp + bias-row masking) stays
    within bf16 tolerance of the exact softmax, including masked tails
    (L=187 exercises 69 padded key positions)."""
    q, k, v = (
        jax.random.normal(jax.random.PRNGKey(i), (3, 12, 187, 6), jnp.bfloat16)
        for i in range(3)
    )
    out = flash_attention(q, k, v).astype(jnp.float32)
    ref = dot_product_attention(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-2)
    # Row-stochasticity proxy: outputs bounded by value range.
    assert float(jnp.max(jnp.abs(out))) <= float(jnp.max(jnp.abs(v.astype(jnp.float32)))) + 1e-2
