import numpy as np

from openmvg_tpu.ops.mser import detect_mser


def test_mser_detects_blobs_both_polarities():
    img = np.full((120, 120), 0.8, np.float32)
    # dark disc
    yy, xx = np.mgrid[0:120, 0:120]
    img[(yy - 40) ** 2 + (xx - 30) ** 2 < 12 ** 2] = 0.1
    # bright ellipse
    img[((yy - 85) / 8.0) ** 2 + ((xx - 80) / 16.0) ** 2 < 1.0] = 1.0
    regions = detect_mser(img)
    assert len(regions) >= 2
    dark = [r for r in regions if r.dark]
    bright = [r for r in regions if not r.dark]
    assert any(abs(r.cx - 30) < 3 and abs(r.cy - 40) < 3 for r in dark)
    hit = [r for r in bright if abs(r.cx - 80) < 3 and abs(r.cy - 85) < 3]
    assert hit
    # elongated ellipse detected with ~2:1 axis ratio
    r = hit[0]
    assert r.major / max(r.minor, 1e-6) > 1.5
