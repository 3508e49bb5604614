"""Native C++ IO runtime tests (PIL as oracle). Skipped if the library has
not been built (`make -C native`)."""

import os
import subprocess

import numpy as np
import pytest
from PIL import Image

from image_enhance_keras_tpu.runtime import native_io


@pytest.fixture(scope="module", autouse=True)
def ensure_built():
    if not native_io.available():
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        subprocess.run(["make", "-C", os.path.join(root, "native")], check=False)
        native_io._lib.cache_clear()
    if not native_io.available():
        pytest.skip("native library not built")


def test_png_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (33, 47, 3), dtype=np.uint8)
    p = str(tmp_path / "t.png")
    assert native_io.imwrite(p, img)
    np.testing.assert_array_equal(np.asarray(Image.open(p).convert("RGB")), img)
    got = native_io.imread(p)
    np.testing.assert_array_equal(got, img)


def test_bmp_roundtrip_and_pil_parity(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (21, 33, 3), dtype=np.uint8)
    p = str(tmp_path / "t.bmp")
    assert native_io.imwrite(p, img)
    np.testing.assert_array_equal(np.asarray(Image.open(p).convert("RGB")), img)
    # decode a PIL-written bmp
    Image.fromarray(img).save(p)
    np.testing.assert_array_equal(native_io.imread(p), img)


def test_ppm_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (9, 11, 3), dtype=np.uint8)
    p = str(tmp_path / "t.ppm")
    assert native_io.imwrite(p, img)
    np.testing.assert_array_equal(native_io.imread(p), img)


def test_decodes_reference_golden_bmp():
    path = "/root/reference/val_images/set5nitre/butterfly_GT.bmp"
    if not os.path.exists(path):
        pytest.skip("reference assets unavailable")
    got = native_io.imread(path)
    want = np.asarray(Image.open(path).convert("RGB"))
    np.testing.assert_array_equal(got, want)


def test_png_palette_and_gray(tmp_path):
    rng = np.random.default_rng(3)
    gray = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    p = str(tmp_path / "g.png")
    Image.fromarray(gray, mode="L").save(p)
    got = native_io.imread(p)
    np.testing.assert_array_equal(got, np.stack([gray] * 3, -1))
    pal = Image.fromarray(rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)).quantize(16)
    p2 = str(tmp_path / "p.png")
    pal.save(p2)
    want = np.asarray(Image.open(p2).convert("RGB"))
    np.testing.assert_array_equal(native_io.imread(p2), want)


def test_batch_loader(tmp_path):
    rng = np.random.default_rng(4)
    imgs = []
    paths = []
    for i in range(12):
        img = rng.integers(0, 256, (10 + i, 20, 3), dtype=np.uint8)
        p = str(tmp_path / f"{i}.png")
        Image.fromarray(img).save(p)
        imgs.append(img)
        paths.append(p)
    paths.append(str(tmp_path / "missing.png"))
    got = native_io.imread_batch(paths, threads=4)
    for want, g in zip(imgs, got):
        np.testing.assert_array_equal(g, want)
    assert got[-1] is None


def test_gather_patches():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (32, 40, 3), dtype=np.uint8)
    ys = np.array([0, 5, 24])
    xs = np.array([0, 10, 32])
    got = native_io.gather_patches(img, ys, xs, 8)
    want = np.stack([img[y : y + 8, x : x + 8] for y, x in zip(ys, xs)])
    np.testing.assert_array_equal(got, want)


def test_gather_patches_empty_corner_list():
    """Empty corner lists return an empty (0,p,p,3) array on BOTH the
    native and the pure-Python path (review r3: np.stack([]) crashed the
    fallback)."""
    import numpy as np

    from image_enhance_keras_tpu.runtime.native_io import gather_patches

    img = np.zeros((16, 16, 3), np.uint8)
    out = gather_patches(img, [], [], 8)
    assert out.shape == (0, 8, 8, 3) and out.dtype == np.uint8


def test_native_io_hardening():
    """r3 codec review fixes: PPM headers with comments decode; unsupported
    imwrite suffixes never truncate an existing file; float input is
    clip+rounded; shape/length validation is loud."""
    import numpy as np
    import pytest

    from image_enhance_keras_tpu.runtime import native_io

    if not native_io.available():
        pytest.skip("native library not built")
    import tempfile, os

    d = tempfile.mkdtemp(prefix="iek_native_")
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (6, 7, 3), dtype=np.uint8)

    # PPM with a comment line in the header (GIMP-style)
    ppm = os.path.join(d, "c.ppm")
    with open(ppm, "wb") as f:
        f.write(b"P6\n# created by GIMP\n7 6\n255\n" + img.tobytes())
    back = native_io.imread(ppm)
    np.testing.assert_array_equal(back, img)

    # unsupported suffix: existing file survives
    keep = os.path.join(d, "keep.tif")
    with open(keep, "wb") as f:
        f.write(b"precious")
    assert native_io.imwrite(keep, img) is False
    assert open(keep, "rb").read() == b"precious"

    # float input: clip+round, not a wraparound cast
    f32 = img.astype(np.float32)
    f32[0, 0] = [300.2, -5.0, 128.6]
    p = os.path.join(d, "f.png")
    assert native_io.imwrite(p, f32)
    out = native_io.imread(p)
    assert tuple(out[0, 0]) == (255, 0, 129)

    # validation: grayscale and mismatched corner lists raise
    with pytest.raises(ValueError, match=r"\(H, W, 3\)"):
        native_io.gather_patches(img[..., 0], [0], [0], 4)
    with pytest.raises(ValueError, match="len"):
        native_io.gather_patches(img, [0, 1], [0], 4)
