"""Native C++ decode+resize pool vs the PIL path (data pipeline parity)."""

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from owlvit_tpu import native  # noqa: E402
from owlvit_tpu.data import DetectionDataset, synthetic  # noqa: E402


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    """A spread of sizes/formats: PNG (synthetic-style), JPEG, grayscale
    PNG, RGBA PNG, up- and down-scaling."""
    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    paths = []
    for i, (w, h) in enumerate([(640, 480), (100, 80), (333, 517), (64, 64)]):
        arr = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        p = str(root / f"rgb{i}.png")
        Image.fromarray(arr).save(p)
        paths.append(p)
    arr = rng.integers(0, 255, size=(240, 320, 3), dtype=np.uint8)
    pj = str(root / "photo.jpg")
    Image.fromarray(arr).save(pj, quality=90)
    paths.append(pj)
    g = rng.integers(0, 255, size=(120, 150), dtype=np.uint8)
    pg = str(root / "gray.png")
    Image.fromarray(g, mode="L").save(pg)
    paths.append(pg)
    a = rng.integers(0, 255, size=(90, 110, 4), dtype=np.uint8)
    pa = str(root / "rgba.png")
    Image.fromarray(a, mode="RGBA").save(pa)
    paths.append(pa)
    return paths


def _pil_reference(path, size):
    img = Image.open(path).convert("RGB")
    w, h = img.size
    return np.asarray(img.resize((size, size), Image.BICUBIC), np.uint8), w, h


@pytest.mark.parametrize("size", [96, 256])
def test_native_matches_pil(images, size):
    if native.image_lib() is None:
        pytest.skip("native image library unavailable")
    out, wh, ok = native.decode_resize_batch(images, size, n_threads=2)
    assert ok.all(), ok
    for i, p in enumerate(images):
        ref, w, h = _pil_reference(p, size)
        assert (int(wh[i, 0]), int(wh[i, 1])) == (w, h)
        diff = np.abs(out[i].astype(np.int32) - ref.astype(np.int32))
        # PIL-exact resampling; decode itself may differ by 1 LSB between
        # libjpeg builds. Require exactness for PNG, <=1 LSB for JPEG.
        if p.endswith(".png"):
            np.testing.assert_array_equal(out[i], ref, err_msg=p)
        else:
            assert diff.max() <= 1, (p, diff.max())


def test_unreadable_file_flagged(tmp_path, images):
    if native.image_lib() is None:
        pytest.skip("native image library unavailable")
    bad = str(tmp_path / "corrupt.png")
    with open(bad, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\nnot really a png")
    out, wh, ok = native.decode_resize_batch([images[0], bad], 64)
    assert ok[0] and not ok[1]


def test_dataset_load_batch_matches_getitem(tmp_path):
    files = synthetic.generate(
        str(tmp_path / "synth"), n_train=6, n_test=2, n_classes=2, seed=0
    )
    ds_native = DetectionDataset(
        files["train"], files["images_dir"], image_size=96, max_gt=8,
        native_decode=True,
    )
    ds_pil = DetectionDataset(
        files["train"], files["images_dir"], image_size=96, max_gt=8,
        native_decode=False,
    )
    batch_n = ds_native.load_batch([0, 3, 5])
    batch_p = ds_pil.load_batch([0, 3, 5])
    for a, b in zip(batch_n, batch_p):
        for k in ("image", "boxes", "labels", "gt_mask"):
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)
        assert a["path"] == b["path"]


def test_cache_build_uses_batch_decode(tmp_path):
    files = synthetic.generate(
        str(tmp_path / "synth"), n_train=5, n_test=2, n_classes=2, seed=1
    )
    ds_cached = DetectionDataset(
        files["train"], files["images_dir"], image_size=64, max_gt=8,
        cache_resized=True,
    )
    ds_plain = DetectionDataset(
        files["train"], files["images_dir"], image_size=64, max_gt=8,
        native_decode=False,
    )
    for i in range(len(ds_cached)):
        np.testing.assert_array_equal(
            ds_cached[i]["image"], ds_plain[i]["image"]
        )


def test_16bit_png_falls_back_to_pil(tmp_path):
    """16-bit PNGs: PIL's convert('RGB') clips mode-'I' pixels at 255,
    which strip_16 would not reproduce — the native decoder must refuse
    (ok=0) so the PIL fallback keeps the pixel contract."""
    if native.image_lib() is None:
        pytest.skip("native image library unavailable")
    arr16 = (np.arange(40 * 30, dtype=np.uint32).reshape(30, 40) * 97 % 65536
             ).astype(np.uint16)
    p16 = str(tmp_path / "deep.png")
    Image.fromarray(arr16, mode="I;16").save(p16)
    out, wh, ok = native.decode_resize_batch([p16], 32)
    assert not ok[0]
    # and the dataset-level batch path produces PIL-identical pixels
    ds_dir = tmp_path / "imgs"
    ds_dir.mkdir()
    import shutil

    shutil.copy(p16, ds_dir / "deep.png")
    ref, w, h = _pil_reference(str(ds_dir / "deep.png"), 32)
    from owlvit_tpu.data.dataset import DetectionDataset  # noqa: F401

    # direct helper-level check via a dataset-free call:
    from owlvit_tpu.data import dataset as ds_mod

    class _D:
        images_dir = str(ds_dir)
        image_size = 32
        native_decode = True
        _decode_resize = ds_mod.DetectionDataset._decode_resize
        _decode_resize_many = ds_mod.DetectionDataset._decode_resize_many

    d = _D()
    imgs, whs = _D._decode_resize_many(d, ["deep.png"])
    np.testing.assert_array_equal(imgs[0], ref)


def test_decode_bytes_matches_pil(tmp_path):
    """Single-buffer decode (serving uploads) is pixel-identical to PIL for
    PNG and JPEG; 16-bit PNG refuses (None) so the PIL fallback keeps
    pixel parity."""
    if native.image_lib() is None:
        pytest.skip("native image library unavailable")
    import io

    rng = np.random.default_rng(7)
    arr = rng.integers(0, 255, (37, 53, 3), dtype=np.uint8)

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    png = buf.getvalue()
    out = native.decode_bytes(png)
    assert out is not None and out.shape == (37, 53, 3)
    np.testing.assert_array_equal(out, arr)

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=95)
    jpg = buf.getvalue()
    out = native.decode_bytes(jpg)
    ref = np.asarray(Image.open(io.BytesIO(jpg)).convert("RGB"))
    assert out is not None
    np.testing.assert_array_equal(out, ref)  # same libjpeg as PIL

    arr16 = (rng.integers(0, 65535, (8, 8), dtype=np.uint16))
    buf = io.BytesIO()
    Image.fromarray(arr16.astype(np.int32), mode="I").save(buf, format="PNG")
    assert native.decode_bytes(buf.getvalue()) is None  # caller falls to PIL

    assert native.decode_bytes(b"definitely not an image") is None


def test_decode_bytes_rejects_crafted_dimension_bomb():
    """A PNG whose header declares absurd dimensions (500000x500000 ≈
    750 GB RGB) must fail the slot (None -> PIL fallback with its own bomb
    limits), not std::terminate the serving process — the bad_alloc used
    to cross the C ABI and SIGABRT on one crafted upload."""
    import struct
    import zlib

    from owlvit_tpu import native

    if native.image_lib() is None:
        pytest.skip("native image library unavailable")

    def chunk(typ, data):
        c = typ + data
        return struct.pack(">I", len(data)) + c + struct.pack(
            ">I", zlib.crc32(c))

    ihdr = struct.pack(">IIBBBBB", 500000, 500000, 8, 2, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(b"\x00" * 100))
           + chunk(b"IEND", b""))
    assert native.decode_bytes(png) is None  # refused, process alive


def test_decode_resize_batch_survives_corrupt_file(tmp_path):
    """One corrupt file in a batch fails its slot (ok=False), never the
    worker thread / process."""
    from PIL import Image

    from owlvit_tpu import native

    if native.image_lib() is None:
        pytest.skip("native image library unavailable")
    good = str(tmp_path / "good.png")
    Image.fromarray(np.full((20, 30, 3), 7, np.uint8)).save(good)
    bad = str(tmp_path / "bad.png")
    with open(bad, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\nnot really")
    out, wh, ok = native.decode_resize_batch([good, bad], 16)
    assert ok.tolist() == [True, False]
    assert tuple(wh[0]) == (30, 20)
