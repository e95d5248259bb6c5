"""Self-ensemble (×8 TTA) tests."""

import pytest
import numpy as np

import jax
import jax.numpy as jnp

from super_resolution_tpu.ops import self_ensemble
from super_resolution_tpu.ops.ensemble import _dihedral, _dihedral_inv


@pytest.mark.fast
def test_dihedral_inverses():
    x = jnp.asarray(np.random.RandomState(0).rand(6, 10, 3),
                    dtype=jnp.float32)
    for k in range(8):
        np.testing.assert_array_equal(
            np.asarray(_dihedral_inv(_dihedral(x, k), k)), np.asarray(x))


def test_dihedral_transforms_are_distinct():
    x = jnp.asarray(np.random.RandomState(1).rand(8, 8, 1),
                    dtype=jnp.float32)
    outs = [np.asarray(_dihedral(x, k)).tobytes() for k in range(8)]
    assert len(set(outs)) == 8


def test_self_ensemble_equivariant_fn_is_identity_mean():
    """For an upscale that commutes with the dihedral group (nearest
    ×2 replication), the ensemble must equal the plain result."""
    def up(img):
        img = jnp.repeat(img, 2, axis=0)
        return jnp.repeat(img, 2, axis=1)

    x = jnp.asarray(np.random.RandomState(2).rand(5, 7, 3),
                    dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(self_ensemble(up, x)),
                               np.asarray(up(x)), atol=1e-6)


def test_self_ensemble_averages_toward_symmetry():
    """With a non-equivariant fn, the ensemble output itself must be
    invariant under input transforms (averaging over the group)."""
    w = jnp.asarray(np.random.RandomState(3).rand(4, 4, 1),
                    dtype=jnp.float32)

    def up(img):           # deliberately breaks symmetry via fixed mask
        big = jnp.repeat(jnp.repeat(img, 2, axis=0), 2, axis=1)
        return big * jnp.repeat(jnp.repeat(w, 2, 0), 2, 1)

    x = jnp.asarray(np.random.RandomState(4).rand(4, 4, 1),
                    dtype=jnp.float32)
    base = self_ensemble(up, x)
    # ensemble(T(x)) == T(ensemble(x)) for every group element
    for k in range(8):
        lhs = np.asarray(self_ensemble(up, _dihedral(x, k)))
        rhs = np.asarray(_dihedral(base, k))
        np.testing.assert_allclose(lhs, rhs, atol=1e-6)


def test_self_ensemble_with_real_generator():
    from super_resolution_tpu.config import GeneratorConfig
    from super_resolution_tpu.models import RRDBNet

    cfg = GeneratorConfig(n_blocks=1, filters=8, growth=4)
    g = RRDBNet(cfg)
    v = g.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
    fn = jax.jit(lambda x: g.apply(v, x[None])[0])
    x = jax.random.normal(jax.random.key(1), (10, 14, 3)) * 0.3
    out = self_ensemble(fn, x)
    assert out.shape == (40, 56, 3)
    # close to the plain output (TTA is an average, not a distortion)
    plain = fn(x)
    assert float(jnp.abs(out - plain).mean()) < 0.1
