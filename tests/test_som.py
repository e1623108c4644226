"""Kohonen SOM behavioral suite (parity with the reference's
kohonen/test_kohonen.py:7-94 coverage)."""

import numpy as np
import pytest

from senas_tpu.som import KohonenSOM


def _data(n=20, d=3, seed=0):
    return np.random.default_rng(seed).random((n, d))


def test_output_shape():
    som = KohonenSOM(6, 4, n_iterations=3, random_state=0).fit(_data())
    assert som.weights.shape == (6, 4, 3)


def test_reproducible_with_seed():
    a = KohonenSOM(5, 5, n_iterations=3, random_state=42).fit(_data())
    b = KohonenSOM(5, 5, n_iterations=3, random_state=42).fit(_data())
    np.testing.assert_allclose(a.weights, b.weights, rtol=1e-6)


def test_infers_input_dimension():
    som = KohonenSOM(4, 4, n_iterations=2, random_state=0).fit(_data(d=7))
    assert som.weights.shape[-1] == 7


def test_bmu_moves_toward_input():
    som = KohonenSOM(4, 4, n_iterations=1, random_state=0)
    x = np.tile([0.5, 0.5, 0.5], (10, 1))
    som.fit(x)
    bx, by = som._best_matching_unit(x[0])
    assert np.linalg.norm(som.weights[bx, by] - x[0]) < 0.25


def test_quantization_error_decreases_with_training():
    data = _data(50)
    short = KohonenSOM(6, 6, n_iterations=1, random_state=0).fit(data)
    long = KohonenSOM(6, 6, n_iterations=25, random_state=0).fit(data)
    assert long.quantization_error(data) < short.quantization_error(data)


def test_small_grid_does_not_crash():
    KohonenSOM(1, 1, n_iterations=2, random_state=0).fit(_data(5))


def test_rejects_bad_input():
    som = KohonenSOM(3, 3, n_iterations=1)
    with pytest.raises(ValueError):
        som.fit(np.zeros((0, 3)))
    with pytest.raises(ValueError):
        som.fit(np.zeros(3))
    with pytest.raises(ValueError):
        KohonenSOM(0, 3)
    with pytest.raises(ValueError):
        KohonenSOM(3, 3, n_iterations=0)


def test_predict_returns_grid_coordinates():
    data = _data(30)
    som = KohonenSOM(5, 7, n_iterations=3, random_state=0).fit(data)
    coords = som.predict(data)
    assert coords.shape == (30, 2)
    assert (coords[:, 0] < 5).all() and (coords[:, 1] < 7).all()
    assert (coords >= 0).all()


def test_topographic_error_in_unit_range():
    data = _data(40)
    som = KohonenSOM(6, 6, n_iterations=5, random_state=0).fit(data)
    te = som.topographic_error(data)
    assert 0.0 <= te <= 1.0


def test_history_tracks_one_qe_per_iteration():
    som = KohonenSOM(4, 4, n_iterations=7, random_state=0)
    som.fit(_data(), record_history=True)
    assert len(som.quantization_error_history_) == 7
    assert all(isinstance(v, float) for v in som.quantization_error_history_)


def test_save_and_load_roundtrip(tmp_path):
    som = KohonenSOM(4, 4, n_iterations=2, random_state=0).fit(_data())
    path = str(tmp_path / "som_weights")
    som.save(path)
    other = KohonenSOM(4, 4, n_iterations=2).load(path)
    np.testing.assert_allclose(som.weights, other.weights)


def test_methods_raise_before_fit():
    som = KohonenSOM(4, 4)
    for call in [lambda: som.predict(_data()),
                 lambda: som.quantization_error(_data()),
                 lambda: som.topographic_error(_data())]:
        with pytest.raises(RuntimeError):
            call()
