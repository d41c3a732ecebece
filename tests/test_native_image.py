"""Native image pipeline: C++ JPEG/PNG decode + Lanczos resize + prefetch.

Reference semantics under test: data/MVSDataset.py:102-118 (read_img —
LANCZOS min-side-fit resize) and train.py:118-122 (DataLoader worker pool,
replaced by data/prefetch.py).
"""
import numpy as np
import pytest
from PIL import Image

from wildmvs import cpp
from wildmvs.data import prefetch
from wildmvs.data.loaders import read_image, read_images

pytestmark = pytest.mark.skipif(not cpp.has_image_module(),
                                reason="native image module not built")


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    # smooth-ish content (noise is the worst case for Lanczos ringing and
    # not representative of photos)
    base = rng.random((37, 53, 3))
    arr = np.kron(base, np.ones((8, 8, 1)))[:290, :420]
    arr = (arr * 255).astype(np.uint8)
    Image.fromarray(arr).save(d / "a.png")
    Image.fromarray(arr).save(d / "a.jpg", quality=95)
    gray = (np.kron(rng.random((10, 12)), np.ones((8, 8))) * 255)
    Image.fromarray(gray[:77, :91].astype(np.uint8)).save(d / "g.png")
    Image.fromarray(arr).save(d / "a.bmp")  # exotic -> PIL fallback
    return d


def test_png_decode_exact(images):
    (img, r), = cpp.load_images([images / "a.png"])
    ref = np.asarray(Image.open(images / "a.png"), np.float32) / 255
    assert img.shape == ref.shape and r == 1.0
    np.testing.assert_allclose(img, ref, atol=1e-6)


def test_nonstandard_png_formats_fall_back_to_pil(images, tmp_path):
    """16-bit / RGBA / palette PNGs decode to different arrays under PIL
    (uint16 range, [H,W,4], palette indices); the native decoder must refuse
    them so read_images keeps PIL's semantics instead of normalizing."""
    rng = np.random.default_rng(1)
    p16 = tmp_path / "d16.png"
    arr16 = (rng.random((40, 50)) * 65535).astype(np.uint16)
    Image.fromarray(arr16, mode="I;16").save(p16)
    prgba = tmp_path / "rgba.png"
    arr4 = (rng.random((40, 50, 4)) * 255).astype(np.uint8)
    Image.fromarray(arr4, mode="RGBA").save(prgba)
    ppal = tmp_path / "pal.png"
    Image.fromarray((rng.random((40, 50, 3)) * 255).astype(np.uint8)) \
        .convert("P", palette=Image.ADAPTIVE).save(ppal)
    for p in (p16, prgba, ppal):
        with pytest.raises(RuntimeError):
            cpp.load_images([p])
        (img, r), = read_images([p])  # falls back to PIL for the batch
        ref = np.asarray(Image.open(p), np.float32) / 255
        assert img.shape == ref.shape
        np.testing.assert_allclose(img, ref, atol=1e-6)


def test_jpeg_decode_matches_pil(images):
    (img, _), = cpp.load_images([images / "a.jpg"])
    ref = np.asarray(Image.open(images / "a.jpg"), np.float32) / 255
    # same libjpeg underneath; allow 1 LSB for IDCT variant differences
    assert np.abs(img - ref).max() <= 1.5 / 255


def test_gray_png_is_2d(images):
    (img, _), = cpp.load_images([images / "g.png"])
    ref = np.asarray(Image.open(images / "g.png"), np.float32) / 255
    assert img.ndim == 2 and img.shape == ref.shape
    np.testing.assert_allclose(img, ref, atol=1e-6)


def test_minside_resize_matches_pil_box_semantics(images):
    th, tw = 128, 160
    (img, r), = cpp.load_images([images / "a.png"], resize_to=(th, tw))
    pil = Image.open(images / "a.png")
    w, h = pil.size
    rr = min(w / tw, h / th)
    ref = np.asarray(pil.resize((int(w / rr), int(h / rr)), Image.LANCZOS),
                     np.float32) / 255
    assert img.shape == ref.shape
    assert abs(r - rr) < 1e-5
    d = np.abs(img - ref)
    # PIL resamples through an 8-bit intermediate (clipping Lanczos
    # overshoot between the passes); we stay float32, so isolated pixels at
    # sharp edges differ by the clipped overshoot. Mean stays at LSB level.
    assert d.mean() < 1.0 / 255 and d.max() < 0.08


def test_read_image_native_vs_pil_paths(images, monkeypatch):
    native, rn = read_image(images / "a.png", resize_to=(96, 96))
    monkeypatch.setenv("WILDMVS_NATIVE_IO", "0")
    pil, rp = read_image(images / "a.png", resize_to=(96, 96))
    assert native.shape == pil.shape and abs(rn - rp) < 1e-5
    assert np.abs(native - pil).mean() < 1.0 / 255


def test_exotic_format_falls_back_to_pil(images):
    img, r = read_image(images / "a.bmp")
    ref = np.asarray(Image.open(images / "a.bmp"), np.float32) / 255
    np.testing.assert_allclose(img, ref, atol=1e-6)


def test_batch_decode_parallel(images):
    paths = [images / "a.png", images / "a.jpg", images / "g.png"] * 3
    res = cpp.load_images(paths, threads=4)
    assert len(res) == 9
    for i in (0, 3, 6):
        np.testing.assert_allclose(res[i][0], res[0][0])


def test_batch_decode_missing_file_raises(images):
    with pytest.raises(RuntimeError, match="missing"):
        cpp.load_images([images / "missing.png"])


def test_read_images_missing_file_fallback_raises(images):
    # native raises -> PIL fallback also fails -> FileNotFoundError surfaces
    with pytest.raises(FileNotFoundError):
        read_images([images / "nope.jpg"])


def test_corrupt_native_library_falls_back(images):
    """A truncated/corrupt .so (e.g. an interrupted build) must make
    get_lib() return None — engaging the scipy/PIL fallbacks — not raise
    OSError out of every caller; the artifacts are dropped for a rebuild."""
    import subprocess
    import sys
    from pathlib import Path
    so = Path(cpp.__file__).parent / "libwildmvs_native.so"
    stamp = so.parent / ".native_build"
    assert cpp.get_lib() is not None  # ensure built
    real = so.read_bytes()
    real_stamp = stamp.read_text()
    # dlopen caches by path inside a process, so the corrupt-load must be
    # exercised in a fresh one. Unlink before replacing: this process has
    # the library mapped, and overwriting the inode would corrupt its pages.
    probe = (
        "from wildmvs import cpp\n"
        "from wildmvs.data.loaders import read_images\n"
        f"(img, r), = read_images([{str(images / 'a.png')!r}])\n"
        "assert img.shape[-1] == 3  # PIL fallback engaged\n"
        "print('LIB_NONE' if cpp.get_lib() is None else 'LIB_OK')\n")
    try:
        so.unlink()
        so.write_bytes(b"not an elf file")
        stamp.write_text(real_stamp)
        out = subprocess.run([sys.executable, "-c", probe],
                             capture_output=True, text=True, timeout=120)
        assert "LIB_NONE" in out.stdout, (out.stdout, out.stderr)
        assert not so.exists()  # dropped so the next process rebuilds
    finally:
        so.unlink(missing_ok=True)
        so.write_bytes(real)
        stamp.write_text(real_stamp)
    assert cpp.get_lib() is not None


def test_native_resize_standalone():
    rng = np.random.default_rng(1)
    img = rng.random((40, 56, 3)).astype(np.float32)
    out = cpp.resize_lanczos(img, 20, 28)
    assert out.shape == (20, 28, 3)
    # reduction by exactly 2x: compare against PIL on the uint8 grid
    pil = Image.fromarray((img * 255).astype(np.uint8)).resize(
        (28, 20), Image.LANCZOS)
    ref = np.asarray(pil, np.float32) / 255
    assert np.abs(np.clip(out, 0, 1) - ref).mean() < 2.0 / 255


class _SlowDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        import time
        time.sleep(0.01)
        return {"x": np.full((2,), float(i))}


def test_prefetch_preserves_order():
    ds = _SlowDataset(17)
    idx = np.random.default_rng(0).permutation(17)
    got = [s["x"][0] for s in prefetch.iterate(ds, idx, num_workers=4)]
    assert got == [float(i) for i in idx]


def test_prefetch_inline_mode_identical():
    ds = _SlowDataset(5)
    idx = np.arange(5)
    a = [s["x"][0] for s in prefetch.iterate(ds, idx, num_workers=0)]
    b = [s["x"][0] for s in prefetch.iterate(ds, idx, num_workers=3)]
    assert a == b


def test_prefetch_batches_keeps_tail():
    """The reference's DataLoader defaults to drop_last=False
    (train.py:120-122): tail samples must reach the loop as a partial
    batch, and a batch_size larger than the dataset still yields one."""
    ds = _SlowDataset(10)

    def collate(samples):
        return {"x": np.stack([s["x"] for s in samples])}

    out = list(prefetch.iterate_batches(ds, np.arange(10), 4, collate,
                                        num_workers=2))
    assert [o["x"].shape[0] for o in out] == [4, 4, 2]
    np.testing.assert_allclose(out[2]["x"][:, 0], [8, 9])
    out = list(prefetch.iterate_batches(ds, np.arange(3), 16, collate,
                                        num_workers=2))
    assert [o["x"].shape[0] for o in out] == [3]
