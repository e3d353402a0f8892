"""Native C normalization kernel: build, bind, match numpy."""

import numpy as np

from dense2sparse_vit_tpu.native import native_available, normalize_u8
from dense2sparse_vit_tpu.native.normalize import _build, _LIB_PATH

MEAN = (0.485, 0.456, 0.406)
STD = (0.229, 0.224, 0.225)


class TestNativeNormalize:
    def test_library_builds(self):
        import os

        assert native_available(), "C toolchain present in image; must build"
        assert os.path.exists(_LIB_PATH)

    def test_matches_numpy(self):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (5, 17, 23, 3), dtype=np.uint8)
        got = normalize_u8(img, MEAN, STD)
        want = (img.astype(np.float32) / 255.0 - np.asarray(MEAN, np.float32)) \
            / np.asarray(STD, np.float32)
        assert got.dtype == np.float32
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_multithreaded_path_matches(self):
        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, (4, 224, 224, 3), dtype=np.uint8)  # > 64k px
        got = normalize_u8(img, MEAN, STD, n_threads=4)
        want = normalize_u8(img, MEAN, STD, n_threads=1)
        np.testing.assert_array_equal(got, want)

    def test_disable_env_falls_back(self, monkeypatch):
        import dense2sparse_vit_tpu.native.normalize as nz

        monkeypatch.setenv("D2S_DISABLE_NATIVE", "1")
        monkeypatch.setattr(nz, "_tried", False)
        monkeypatch.setattr(nz, "_lib", None)
        img = np.zeros((2, 4, 4, 3), np.uint8)
        out = nz.normalize_u8(img, MEAN, STD)
        want = (0.0 - np.asarray(MEAN, np.float32)) / np.asarray(STD, np.float32)
        np.testing.assert_allclose(out[0, 0, 0], want, rtol=1e-6)
