"""Tests of the SO(3) math core: orthogonality, equivariance, 3j identities."""

import numpy as np
import jax.numpy as jnp
import jax
import pytest

from pair_allegro_tpu.ops.so3 import (
    real_wigner_3j,
    sh_dim,
    sh_slice,
    spherical_harmonics,
    spherical_harmonics_np,
    wigner_D_np,
)

LMAX = 4


def random_rotation(rng):
    a = rng.randn(3, 3)
    q, r = np.linalg.qr(a)
    q *= np.sign(np.diag(r))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return q


def test_l1_convention():
    """l=1 block is sqrt(3) * (y, z, x) — the e3nn ordering."""
    v = np.array([0.3, -0.5, 0.8])
    v = v / np.linalg.norm(v)
    y = spherical_harmonics_np(v, 1)
    np.testing.assert_allclose(y[0], 1.0, atol=1e-14)
    np.testing.assert_allclose(y[1:4], np.sqrt(3.0) * np.array([v[1], v[2], v[0]]), atol=1e-14)


def test_component_normalization():
    """|Y_l(n)|^2 == 2l+1 for every l, any unit n."""
    rng = np.random.RandomState(3)
    v = rng.randn(64, 3)
    y = spherical_harmonics_np(v, LMAX)
    for l in range(LMAX + 1):
        block = y[:, sh_slice(l)]
        np.testing.assert_allclose(
            np.sum(block**2, axis=-1), 2 * l + 1, rtol=1e-12, err_msg=f"l={l}"
        )


def test_orthogonality_on_sphere():
    """E[Y_i Y_j] over the sphere = delta_ij (component normalization)."""
    rng = np.random.RandomState(4)
    v = rng.randn(400000, 3)
    y = spherical_harmonics_np(v, 3)
    gram = y.T @ y / y.shape[0]
    np.testing.assert_allclose(gram, np.eye(sh_dim(3)), atol=0.02)


def test_jnp_matches_np_and_handles_zero():
    rng = np.random.RandomState(5)
    v = rng.randn(32, 3)
    a = np.asarray(spherical_harmonics(jnp.asarray(v), LMAX))
    b = spherical_harmonics_np(v, LMAX)
    np.testing.assert_allclose(a, b, atol=1e-12)
    # zero vector must not NaN (padded edges) and must be differentiable
    z = spherical_harmonics(jnp.zeros((3,)), 2)
    assert np.all(np.isfinite(np.asarray(z)))
    g = jax.jacobian(lambda x: spherical_harmonics(x, 2))(jnp.array([0.3, -0.5, 0.8]))
    assert np.all(np.isfinite(np.asarray(g)))


def test_wigner_D_equivariance_and_orthogonality():
    rng = np.random.RandomState(6)
    for _ in range(3):
        R = random_rotation(rng)
        v = rng.randn(16, 3)
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        y = spherical_harmonics_np(v, LMAX)
        yR = spherical_harmonics_np(v @ R.T, LMAX)
        for l in range(LMAX + 1):
            D = wigner_D_np(l, R)
            np.testing.assert_allclose(D @ D.T, np.eye(2 * l + 1), atol=1e-10)
            np.testing.assert_allclose(
                yR[:, sh_slice(l)], y[:, sh_slice(l)] @ D.T, atol=1e-10, err_msg=f"l={l}"
            )


def test_wigner_D_composition():
    rng = np.random.RandomState(7)
    R1, R2 = random_rotation(rng), random_rotation(rng)
    for l in range(LMAX + 1):
        np.testing.assert_allclose(
            wigner_D_np(l, R1 @ R2), wigner_D_np(l, R1) @ wigner_D_np(l, R2), atol=1e-9
        )


@pytest.mark.parametrize(
    "l1,l2,l3",
    [(l1, l2, l3) for l1 in range(4) for l2 in range(4) for l3 in range(abs(l1 - l2), min(3, l1 + l2) + 1)],
)
def test_3j_intertwines(l1, l2, l3):
    C = real_wigner_3j(l1, l2, l3)
    assert np.isclose(np.sum(C**2), 1.0)
    rng = np.random.RandomState(l1 * 16 + l2 * 4 + l3)
    R = random_rotation(rng)
    D1, D2, D3 = wigner_D_np(l1, R), wigner_D_np(l2, R), wigner_D_np(l3, R)
    lhs = np.einsum("ia,jb,ijk->abk", D1, D2, C)
    rhs = np.einsum("kc,abc->abk", D3, C)
    np.testing.assert_allclose(lhs, rhs, atol=1e-9)


def test_3j_triangle_rule_zero():
    assert np.all(real_wigner_3j(0, 0, 1) == 0)
    assert np.all(real_wigner_3j(1, 1, 3) == 0)


def test_3j_known_blocks():
    # 1 x 1 -> 0 is the dot product (up to normalization)
    C = real_wigner_3j(1, 1, 0)[:, :, 0]
    np.testing.assert_allclose(np.abs(C), np.eye(3) / np.sqrt(3.0), atol=1e-10)
    np.testing.assert_allclose(C, C.T, atol=1e-12)
    # 1 x 1 -> 1 is the cross product (antisymmetric)
    C = real_wigner_3j(1, 1, 1)
    np.testing.assert_allclose(C, -np.transpose(C, (1, 0, 2)), atol=1e-10)
    np.testing.assert_allclose(np.abs(C[C != 0]), 1.0 / np.sqrt(6.0), atol=1e-10)


def test_sh_product_decomposes_via_3j():
    """Y_l1(n) (x) Y_l2(n) projected with the 3j onto l3 must be proportional
    to Y_l3(n) with a direction-independent constant (Gaunt property)."""
    rng = np.random.RandomState(9)
    v = rng.randn(8, 3)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    y = spherical_harmonics_np(v, 4)
    for (l1, l2, l3) in [(1, 1, 2), (1, 2, 3), (2, 2, 2), (2, 2, 4)]:
        C = real_wigner_3j(l1, l2, l3)
        proj = np.einsum("ni,nj,ijk->nk", y[:, sh_slice(l1)], y[:, sh_slice(l2)], C)
        target = y[:, sh_slice(l3)]
        ratio = proj / target
        np.testing.assert_allclose(ratio, ratio[0, 0], rtol=1e-8)


def test_packed_tp_matches_per_path():
    """uniform_tp_packed must equal uniform_tp + stacking, path for path."""
    import jax
    import jax.numpy as jnp
    from pair_allegro_tpu.ops.tp import (
        packed_tp_table, tp_mix_apply, tp_mix_apply_packed, tp_mix_init,
        packed_scalar_part, scalar_part, uniform_tp, uniform_tp_packed,
    )

    rng = np.random.RandomState(11)
    E, C, lmax = 7, 5, 2
    D = (lmax + 1) ** 2
    x = jnp.asarray(rng.randn(E, C, D))
    y = jnp.asarray(rng.randn(E, C, D))
    T_list = uniform_tp(x, y, lmax)
    T_packed = uniform_tp_packed(x, y, lmax)
    _, layout = packed_tp_table(lmax, lmax, lmax)
    for l3, (off, p) in enumerate(layout):
        k = 2 * l3 + 1
        blk = np.asarray(T_packed[..., off : off + p * k]).reshape(E, C, p, k)
        np.testing.assert_allclose(blk, np.asarray(T_list[l3]), atol=1e-12, err_msg=f"l3={l3}")
    np.testing.assert_allclose(
        np.asarray(packed_scalar_part(T_packed, lmax, lmax, lmax)),
        np.asarray(scalar_part(T_list)), atol=1e-12,
    )
    ws = tp_mix_init(jax.random.PRNGKey(0), lmax, lmax, lmax, C, C, jnp.float64)
    np.testing.assert_allclose(
        np.asarray(tp_mix_apply_packed(ws, T_packed, lmax, lmax, lmax)),
        np.asarray(tp_mix_apply(ws, T_list)), atol=1e-12,
    )


def test_combined_tp_mix_matches_per_path():
    """tp_mix_combined must equal uniform_tp + tp_mix_apply + scalar_part."""
    import jax
    import jax.numpy as jnp
    from pair_allegro_tpu.ops.tp import (
        scalar_part, tp_mix_apply, tp_mix_combined, tp_mix_init, uniform_tp,
    )

    rng = np.random.RandomState(12)
    E, C, lmax = 6, 4, 2
    D = (lmax + 1) ** 2
    x = jnp.asarray(rng.randn(E, C, D))
    y = jnp.asarray(rng.randn(E, C, D))
    ws = tp_mix_init(jax.random.PRNGKey(1), lmax, lmax, lmax, C, C, jnp.float64)
    T = uniform_tp(x, y, lmax)
    Vp_ref = tp_mix_apply(ws, T)
    inv_ref = scalar_part(T)
    Vp, inv = tp_mix_combined(x, y, ws, lmax)
    np.testing.assert_allclose(np.asarray(Vp), np.asarray(Vp_ref), atol=1e-12)
    np.testing.assert_allclose(np.asarray(inv), np.asarray(inv_ref), atol=1e-12)


def test_tp_mix_fused_ref_path():
    """tp_mix_fused off-TPU routes to the reference implementation and its
    VJP matches jax.grad of the unfused math for V/env (weights get
    NaN-poisoned cotangents by design — forces only, training fails loud)."""
    import jax
    import jax.numpy as jnp
    from pair_allegro_tpu.ops.pallas_tp import tp_mix_fused
    from pair_allegro_tpu.ops.tp import scalar_part, tp_mix_apply, tp_mix_init, uniform_tp

    rng = np.random.RandomState(13)
    E, C, lmax = 5, 4, 2
    D = (lmax + 1) ** 2
    V = jnp.asarray(rng.randn(E, C, D))
    env = jnp.asarray(rng.randn(E, C, D))
    ws_d = tp_mix_init(jax.random.PRNGKey(2), lmax, lmax, lmax, C, C, jnp.float64)
    ws = tuple(ws_d[f"l{l}"] for l in range(lmax + 1))
    o, i = tp_mix_fused(V, env, ws, lmax)
    T = uniform_tp(V, env, lmax)
    np.testing.assert_allclose(np.asarray(o), np.asarray(tp_mix_apply(ws_d, T)), atol=1e-12)
    np.testing.assert_allclose(np.asarray(i), np.asarray(scalar_part(T)), atol=1e-12)

    def loss_fused(v, e):
        o, i = tp_mix_fused(v, e, ws, lmax)
        return jnp.sum(o**2) + jnp.sum(i**2)

    def loss_ref(v, e):
        T = uniform_tp(v, e, lmax)
        return jnp.sum(tp_mix_apply(ws_d, T)**2) + jnp.sum(scalar_part(T)**2)

    g1 = jax.grad(loss_fused, argnums=(0, 1))(V, env)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(V, env)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]), atol=1e-11)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]), atol=1e-11)
