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
