"""Finance-ML pipeline tests (↔ reference z/ — SURVEY §2c)."""

import numpy as np
import pytest

from dla_tpu.models.dataset import DataSet
from dla_tpu.models.features import FeatureSet, audit_overlaps, build_features
from dla_tpu.models.indicators import (
    extract_features,
    make_label,
    rocp,
    rsi,
)
from dla_tpu.models.rawdata import read_rawdata_tsv, write_rawdata_tsv
from dla_tpu.models.synthetic import generate_dataset, synth_ohlcv


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("corpus"))
    generate_dataset(d, ["indices"], days=260, seed=1)
    return d


class TestRawData:
    def test_roundtrip(self, tmp_path):
        rd = synth_ohlcv("TST", days=50, seed=2)
        p = str(tmp_path / "TST.tsv")
        write_rawdata_tsv(p, rd)
        rd2 = read_rawdata_tsv(p)
        assert rd2.ticker == "TST" and len(rd2) == 50
        np.testing.assert_allclose(rd2.close, rd.close, rtol=1e-5)

    def test_reader_skips_garbage(self, tmp_path):
        p = tmp_path / "g.tsv"
        p.write_text(
            "date\topen\thigh\tlow\tclose\tvolume\n"
            "2020-01-01\t1\t2\t0.5\t1.5\t100\n"
            "not\ta\tvalid\trow\n"
            "\n"
            "2020-01-02\t1.5\t2.5\t1\t2\t200\n"
        )
        rd = read_rawdata_tsv(str(p))
        assert len(rd) == 2
        assert rd.close[1] == 2.0

    def test_ohlc_consistency(self):
        rd = synth_ohlcv("X", days=200, seed=3)
        assert np.all(rd.high >= rd.close) and np.all(rd.high >= rd.open)
        assert np.all(rd.low <= rd.close) and np.all(rd.low <= rd.open)
        assert np.all(rd.volume > 0)


class TestIndicators:
    def test_rocp(self):
        x = np.array([1.0, 2.0, 4.0, 2.0])
        np.testing.assert_allclose(rocp(x), [0, 1.0, 1.0, -0.5])

    def test_rsi_bounds(self):
        rd = synth_ohlcv("X", days=300, seed=4)
        r = rsi(rd.close)
        assert np.all(r >= 0) and np.all(r <= 100)

    def test_extract_features_finite(self):
        rd = synth_ohlcv("X", days=300, seed=5)
        names, mat = extract_features(rd)
        assert mat.shape == (len(names), 300)
        assert np.all(np.isfinite(mat))

    def test_make_label_is_decayed_future_return(self):
        close = np.array([1.0, 1.1, 1.21, 1.21, 1.21, 1.21])
        lab = make_label(close, horizon=2, decay=0.5)
        ret0, ret1 = 0.1, 0.1
        expect0 = (ret0 + 0.5 * ret1) / 1.5
        np.testing.assert_allclose(lab[0], expect0, rtol=1e-8)
        assert lab[-1] == 0.0


class TestFeatures:
    def test_build_and_save_load(self, corpus, tmp_path):
        fs = build_features(corpus, window=20, horizon=3)
        assert fs.x.ndim == 3 and fs.x.shape[1] == 20
        assert fs.y.shape == (fs.x.shape[0], len(fs.tickers))
        assert np.all(np.isfinite(fs.x))
        # train-only normalization: train split ~zero-mean unit-var
        xtr, _ = fs.train()
        m = xtr.reshape(-1, xtr.shape[-1]).mean(axis=0)
        assert np.abs(m).max() < 0.2
        p = str(tmp_path / "f.npz")
        fs.save(p)
        fs2 = FeatureSet.load(p)
        np.testing.assert_allclose(fs2.x, fs.x.astype(np.float32), rtol=1e-6)
        assert fs2.tickers == fs.tickers

    def test_audit(self, corpus):
        ranges = audit_overlaps(corpus)
        assert len(ranges) == 4
        for s, e, n in ranges.values():
            assert n == 260 and s < e


class TestDataSet:
    def test_epoch_covers_all(self):
        x = np.arange(10)[:, None]
        y = np.arange(10)[:, None]
        ds = DataSet(x, y, seed=0)
        seen = np.concatenate([xb[:, 0] for xb, _ in ds.epoch(3)])
        assert sorted(seen.tolist()) == list(range(10))


class TestWindPuller:
    def test_learns_signal(self, corpus):
        """Train briefly on a learnable toy mapping and check the profit
        loss decreases and directional accuracy beats chance."""
        from dla_tpu.models.windpuller import WindPuller

        rng = np.random.default_rng(0)
        n, t, f = 256, 8, 6
        x = rng.standard_normal((n, t, f)).astype(np.float32)
        # label = sign-ish function of the last step's first feature
        y = np.tanh(x[:, -1, :1]).astype(np.float32)
        wp = WindPuller(input_shape=(t, f), outputs=1, hidden=(16,), lr=3e-3, seed=1)
        hist = wp.fit(x, y, epochs=12, batch_size=64, verbose=False)
        assert hist["loss"][-1] < hist["loss"][0]
        m = wp.evaluate(x, y)
        assert m["directional_accuracy"] > 0.7
        assert m["pearson"] > 0.5

    def test_save_load_roundtrip(self, tmp_path):
        from dla_tpu.models.windpuller import WindPuller

        wp = WindPuller(input_shape=(5, 4), outputs=2, hidden=(8,), seed=3)
        x = np.random.default_rng(1).standard_normal((7, 5, 4)).astype(np.float32)
        p1 = wp.predict(x)
        path = str(tmp_path / "wp.pkl")
        wp.save(path)
        wp2 = WindPuller.load(path)
        np.testing.assert_allclose(wp2.predict(x), p1, rtol=1e-6)

    def test_orbax_roundtrip(self, tmp_path):
        """*.orbax paths select the orbax-checkpoint directory format (the
        TPU-ecosystem-native persistence alongside the reference-parity
        pickle)."""
        from dla_tpu.models.windpuller import WindPuller

        wp = WindPuller(input_shape=(5, 4), outputs=2, hidden=(8,), seed=3)
        x = np.random.default_rng(1).standard_normal((7, 5, 4)).astype(np.float32)
        p1 = wp.predict(x)
        path = str(tmp_path / "wp.orbax")
        wp.save(path)
        wp2 = WindPuller.load(path)
        np.testing.assert_allclose(wp2.predict(x), p1, rtol=1e-6)
        # format is self-describing on disk: params dir + readable metadata
        assert (tmp_path / "wp.orbax" / "meta.json").exists()


class TestRenorm:
    def test_batch_renorm_shapes_and_stats(self):
        import jax
        import jax.numpy as jnp

        from dla_tpu.models.renorm import BatchRenorm, birelu

        m = BatchRenorm()
        x = jnp.asarray(np.random.default_rng(0).standard_normal((32, 16)), jnp.float32)
        vars_ = m.init(jax.random.PRNGKey(0), x, train=True)
        y, updates = m.apply(vars_, x, train=True, mutable=["batch_stats"])
        assert y.shape == x.shape
        assert "batch_stats" in updates
        y_eval = m.apply(vars_, x, train=False)
        assert y_eval.shape == x.shape
        z = birelu(jnp.asarray([-2.0, 0.0, 3.0]))
        np.testing.assert_allclose(np.asarray(z), [-0.02, 0.0, 3.0], rtol=1e-6)


import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
class TestModelsCLIEndToEnd:
    def test_full_pipeline(self, tmp_path):
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        env["PALLAS_AXON_POOL_IPS"] = ""
        env["JAX_PLATFORMS"] = "cpu"

        def run(*args):
            r = subprocess.run(
                [sys.executable, "-m", "dla_tpu.models.cli", *args],
                capture_output=True, text=True, env=env, timeout=590,
            )
            assert r.returncode == 0, r.stdout + r.stderr
            return r.stdout

        d = str(tmp_path / "data")
        feats = str(tmp_path / "f.npz")
        model = str(tmp_path / "wp.pkl")
        run("gen-data", "--out", d, "--days", "300", "--universes", "indices")
        out = run("audit", "--data", d)
        assert "common overlap" in out
        run("features", "--data", d, "--out", feats, "--window", "16")
        run("train", "--features", feats, "--model", model, "--epochs", "2",
            "--hidden", "8")
        out = run("eval", "--features", feats, "--model", model)
        assert "directional_accuracy" in out
        pred = str(tmp_path / "pred.tsv")
        cum = str(tmp_path / "cum.tsv")
        run("predict", "--features", feats, "--model", model, "--out", pred,
            "--cumret", cum)
        assert os.path.getsize(pred) > 100 and os.path.getsize(cum) > 20
