"""Volume IO regression tests (readimg_as_vol dtype, savevol formats)."""

import numpy as np
import pytest

class TestIOReviewRegressions:
    def test_drop_channel_preserves_dtype(self, tmp_path):
        import cv2

        from pctrans_tpu.data.volume_io import readimg_as_vol

        img = (np.random.RandomState(0).randint(256, 60000, (8, 8, 3))
               .astype(np.uint16))
        p = str(tmp_path / "im16.png")
        assert cv2.imwrite(p, img)  # 16-bit 3-channel PNG
        vol = readimg_as_vol(p, drop_channel=True)
        assert vol.dtype == np.uint16
        assert vol.max() > 255  # not truncated mod 256

    def test_savevol_tif_and_unknown_format(self, tmp_path):
        import os

        from pctrans_tpu.data.volume_io import savevol

        vol = np.random.RandomState(0).randint(0, 255, (3, 8, 8)).astype(np.uint8)
        p = str(tmp_path / "out.tif")
        savevol(p, vol, format="tif")
        assert os.path.exists(p) and os.path.getsize(p) > 0
        with pytest.raises(ValueError):
            savevol(str(tmp_path / "x.npy"), vol, format="npy")
