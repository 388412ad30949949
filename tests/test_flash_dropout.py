"""In-kernel attention-weight dropout (training path).

On TPU the keep mask comes from the hardware PRNG; on CPU the kernel
runs in interpret mode with a deterministic positional hash
(``flash_attention._hash_bits``) so the forward/backward
mask-reproducibility contract is exercised in CI too.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fourierdiffusion_tpu.ops import flash_attention as fa

B, H, L, DH = 1, 2, 30, 6
LP = 128
RATE = 0.3
SEED = 7


def _extract_masks():
    def mask_kernel(seed_ref, o_ref):
        o_ref[0] = fa._keep_scale((H, LP, LP), RATE, seed_ref[0])

    spec = pl.BlockSpec(
        (1, H, LP, LP), lambda b, s: (b, 0, 0, 0), memory_space=pltpu.VMEM
    )
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B,), in_specs=[], out_specs=spec
    )
    keep = pl.pallas_call(
        mask_kernel,
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((B, H, LP, LP), jnp.float32),
        interpret=fa._interpret(),
    )(jnp.asarray([SEED], jnp.int32))
    return jnp.asarray(np.asarray(keep)[:, :, :L, :L])


def test_dropout_forward_and_grads_match_reference() -> None:
    q, k, v = (
        jax.random.normal(jax.random.PRNGKey(i), (B, H, L, DH)) for i in range(3)
    )
    keep = _extract_masks()

    def ref(q, k, v):
        s = jnp.einsum("bhid,bhjd->bhij", q, k) / math.sqrt(DH)
        p = jax.nn.softmax(s, axis=-1) * keep
        return jnp.einsum("bhij,bhjd->bhid", p, v)

    out_k = fa.flash_attention_dropout(q, k, v, jnp.int32(SEED), RATE)
    np.testing.assert_allclose(
        np.asarray(out_k), np.asarray(ref(q, k, v)), atol=2e-3
    )

    gk = jax.grad(lambda *a: jnp.sum(fa.flash_attention_dropout(*a, jnp.int32(SEED), RATE) ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lambda *a: jnp.sum(ref(*a) ** 2), argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", gk, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-2, err_msg=f"d{name}"
        )


def test_dropout_statistics_and_determinism() -> None:
    q, k, v = (
        jax.random.normal(jax.random.PRNGKey(i), (2, 4, 40, 6)) for i in range(3)
    )
    o1 = fa.flash_attention_dropout(q, k, v, jnp.int32(0), 0.5)
    o2 = fa.flash_attention_dropout(q, k, v, jnp.int32(0), 0.5)
    o3 = fa.flash_attention_dropout(q, k, v, jnp.int32(1), 0.5)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    assert not np.allclose(np.asarray(o1), np.asarray(o3))
    # Expectation over seeds approaches the no-dropout output.
    base = fa.flash_attention(q, k, v)
    mean = np.mean(
        [np.asarray(fa.flash_attention_dropout(q, k, v, jnp.int32(s), 0.5)) for s in range(32)],
        axis=0,
    )
    rel = np.abs(mean - np.asarray(base)).mean() / np.abs(np.asarray(base)).mean()
    assert rel < 0.3
