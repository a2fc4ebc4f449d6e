import numpy as np
import jax.numpy as jnp

from panovlm_tpu.ops.pallas.knn import knn_pallas, knn_reference


def test_knn_pallas_matches_reference(rng):
    Q, T, k = 300, 700, 8
    q = jnp.asarray(rng.normal(size=(Q, 3)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(T, 3)).astype(np.float32))
    qm = jnp.asarray(rng.random(Q) > 0.1)
    tm = jnp.asarray(rng.random(T) > 0.1)
    d_ref, i_ref = knn_reference(q, qm, t, tm, k)
    # interpret mode on CPU; the TPU path is exercised by bench/real runs
    d_pl, i_pl = knn_pallas(q, qm, t, tm, k, interpret=True)
    valid = np.asarray(d_ref) < 1e29
    np.testing.assert_allclose(np.asarray(d_pl)[valid], np.asarray(d_ref)[valid],
                               atol=1e-5)
    assert (np.asarray(i_pl) == np.asarray(i_ref))[valid].all()


def test_knn_pallas_masked_rows(rng):
    Q, T, k = 64, 128, 4
    q = jnp.asarray(rng.normal(size=(Q, 3)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(T, 3)).astype(np.float32))
    qm = jnp.zeros(Q, bool).at[:10].set(True)
    tm = jnp.zeros(T, bool).at[:5].set(True)  # only 5 targets: slots beyond
    d, i = knn_pallas(q, qm, t, tm, k, interpret=True)
    d = np.asarray(d)
    assert (d[10:] >= 1e29).all()          # masked queries -> empty
    assert (d[:10, :4] < 1e29).sum() >= 10 * 4  # 5 targets cover k=4


def test_knn_pallas_descriptor_dim(rng):
    """128-dim inputs (descriptor matching, SfM.cpp:235-264 CUDA path)."""
    Q, T, k = 300, 500, 2
    q = rng.normal(size=(Q, 128)).astype(np.float32)
    t = rng.normal(size=(T, 128)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    t /= np.linalg.norm(t, axis=1, keepdims=True)
    qm = jnp.asarray(rng.random(Q) > 0.1)
    tm = jnp.asarray(rng.random(T) > 0.1)
    d_ref, i_ref = knn_reference(jnp.asarray(q), qm, jnp.asarray(t), tm, k)
    d_pl, i_pl = knn_pallas(jnp.asarray(q), qm, jnp.asarray(t), tm, k,
                            interpret=True)
    valid = np.asarray(d_ref) < 1e29
    np.testing.assert_allclose(np.asarray(d_pl)[valid],
                               np.asarray(d_ref)[valid], atol=1e-5)
    assert (np.asarray(i_pl) == np.asarray(i_ref))[valid].all()


def test_match_descriptors_kernel_parity(rng):
    """match_descriptors(use_kernel=True) == XLA path (production wiring)."""
    from panovlm_tpu.utils.sift import match_descriptors
    N = 256
    d = rng.normal(size=(2 * N, 128)).astype(np.float32)
    # make half the rows near-duplicates across the two sets -> real matches
    d[N:N + 128] = d[:128] + 0.05 * rng.normal(size=(128, 128)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d1, d2 = jnp.asarray(d[:N]), jnp.asarray(d[N:])
    m = jnp.ones(N, bool)
    a = match_descriptors(d1, m, d2, m, max_matches=128, use_kernel=False)
    # interpret-mode kernel (CPU CI); numerics differ at float ulp level only
    import panovlm_tpu.ops.pallas.knn as knn_mod
    orig = knn_mod.knn_pallas
    knn_mod.knn_pallas = lambda *a_, **k_: orig(*a_, interpret=True, **k_)
    try:
        b = match_descriptors(d1, m, d2, m, max_matches=128, use_kernel=True)
    finally:
        knn_mod.knn_pallas = orig
    assert (np.asarray(a["mask"]) == np.asarray(b["mask"])).all()
    ma = np.asarray(a["mask"])
    assert (np.asarray(a["idx"])[ma] == np.asarray(b["idx"])[ma]).all()
