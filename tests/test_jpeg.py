"""Native rawframe JPEG decoder tests (native/jpeg.cc + data/jpeg.py).

The reference reads dataset frames with torchvision.io/cv2 one file at a
time (reference workoutdetector/datasets/common.py:99-117); here the
whole clip decodes through one libjpeg C++ call with DCT prescaling and
in-decoder resize+crop. These tests pin: full-res bit-exactness vs cv2,
prepped-geometry drift bounds vs the host TestTransform pipeline, the
per-file cv2 fallback, and the FrameDataset integration.
"""

import os
import os.path as osp

import numpy as np
import pytest

from workoutdetector_tpu.data import jpeg as njpeg

cv2 = pytest.importorskip("cv2")

pytestmark = pytest.mark.skipif(not njpeg.native_available(),
                                reason="libwdjpeg.so not built")


@pytest.fixture(scope="module")
def jpeg_dir(tmp_path_factory):
    """Realistic (blurred-noise) JPEGs at several aspect ratios/sizes."""
    d = tmp_path_factory.mktemp("jpegs")
    rng = np.random.default_rng(0)
    paths = []
    for i, (h, w) in enumerate([(720, 1280), (1280, 720), (480, 640),
                                (333, 517), (128, 128)]):
        img = rng.integers(0, 256, size=(max(h // 8, 4), max(w // 8, 4), 3),
                           dtype=np.uint8)
        img = cv2.resize(img, (w, h), interpolation=cv2.INTER_CUBIC)
        p = str(d / f"img_{i + 1:05}.jpg")
        assert cv2.imwrite(p, img)
        paths.append(p)
    return paths


def _cv2_rgb(path):
    return cv2.cvtColor(cv2.imread(path, cv2.IMREAD_COLOR), cv2.COLOR_BGR2RGB)


def test_full_res_bit_exact_vs_cv2(jpeg_dir):
    # both stacks sit on libjpeg ISLOW — full decode must agree exactly
    for p in jpeg_dir:
        a = njpeg.read_image(p)
        b = _cv2_rgb(p)
        assert a.shape == b.shape
        np.testing.assert_array_equal(a, b)


def test_batch_prepped_geometry_and_drift(jpeg_dir):
    from workoutdetector_tpu.data.transforms import TestTransform
    out = njpeg.read_batch_prepped(jpeg_dir, 256, 224)
    assert out.shape == (len(jpeg_dir), 224, 224, 3)
    tt = TestTransform(size=224, scale=256)
    for i, p in enumerate(jpeg_dir):
        host = tt(_cv2_rgb(p)[None], None)[0]
        diff = np.abs(out[i].astype(int) - host.astype(int))
        # DCT prescale + bilinear vs full decode + INTER_AREA: same class
        # of drift as the in-decoder swscale variant (native/decoder.cc)
        assert diff.mean() < 8.0, (p, diff.mean())
        assert diff.max() < 64, (p, diff.max())


def test_batch_prepped_upscale_small_image(jpeg_dir):
    # 128x128 source through scale=256: short side upscales (bilinear)
    out = njpeg.read_batch_prepped([jpeg_dir[-1]], 256, 224)
    assert out.shape == (1, 224, 224, 3)
    from workoutdetector_tpu.data.transforms import TestTransform
    host = TestTransform(size=224, scale=256)(_cv2_rgb(jpeg_dir[-1])[None],
                                              None)[0]
    diff = np.abs(out[0].astype(int) - host.astype(int))
    assert diff.mean() < 8.0


def test_letterbox_canvas_geometry(jpeg_dir):
    # the device_augment train letterbox: scale == crop == 256
    out = njpeg.read_batch_prepped(jpeg_dir[:2], 256, 256)
    assert out.shape == (2, 256, 256, 3)


def test_grayscale_jpeg_decodes_rgb(tmp_path):
    g = np.linspace(0, 255, 64 * 64, dtype=np.uint8).reshape(64, 64)
    p = str(tmp_path / "gray.jpg")
    assert cv2.imwrite(p, g)
    a = njpeg.read_image(p)
    assert a is not None and a.shape == (64, 64, 3)
    # channels equal (grayscale → replicated RGB)
    np.testing.assert_array_equal(a[..., 0], a[..., 1])


def _exif_app1(orientation: int) -> bytes:
    """Minimal APP1/EXIF segment carrying only the Orientation tag."""
    tiff = (b"II*\x00\x08\x00\x00\x00"            # little-endian, IFD @ 8
            + b"\x01\x00"                           # 1 entry
            + b"\x12\x01\x03\x00\x01\x00\x00\x00"   # tag 0x0112, SHORT, x1
            + orientation.to_bytes(2, "little") + b"\x00\x00"
            + b"\x00\x00\x00\x00")                  # next IFD = none
    payload = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + (len(payload) + 2).to_bytes(2, "big") + payload


def test_exif_rotated_jpeg_falls_back_to_cv2(tmp_path, jpeg_dir):
    """libjpeg ignores EXIF while cv2 applies it — the native decoder
    must reject oriented files so the cv2 path keeps images upright."""
    with open(jpeg_dir[0], "rb") as f:
        raw = f.read()
    rotated = str(tmp_path / "rot.jpg")
    with open(rotated, "wb") as f:
        f.write(raw[:2] + _exif_app1(6) + raw[2:])
    assert njpeg.read_image(rotated) is None
    assert njpeg.read_batch_prepped([rotated], 256, 224) is None
    # identity orientation stays on the native path
    upright = str(tmp_path / "up.jpg")
    with open(upright, "wb") as f:
        f.write(raw[:2] + _exif_app1(1) + raw[2:])
    assert njpeg.read_image(upright) is not None
    # the dataset-level reader returns cv2's (EXIF-applied) pixels
    from workoutdetector_tpu.data.datasets import read_image
    a = read_image(rotated)
    b = cv2.cvtColor(cv2.imread(rotated, cv2.IMREAD_COLOR), cv2.COLOR_BGR2RGB)
    np.testing.assert_array_equal(a, b)


def test_native_prep_config_off(jpeg_dir):
    """cfg.data.native_prep=false pins the exact host pixels: the
    TestTransform is marked in_decoder=False and the fast path refuses."""
    from workoutdetector_tpu.data.datasets import _prepped_params
    from workoutdetector_tpu.data.transforms import build_transform
    t_on = build_transform("val", native_prep=True)
    t_off = build_transform("val", native_prep=False)
    assert _prepped_params(t_on) is not None
    assert _prepped_params(t_off) is None


def test_decode_bytes(jpeg_dir):
    with open(jpeg_dir[0], "rb") as f:
        raw = f.read()
    m = njpeg.decode_bytes(raw)
    np.testing.assert_array_equal(m, _cv2_rgb(jpeg_dir[0]))
    assert njpeg.decode_bytes(b"\x89PNG\r\n") is None
    assert njpeg.decode_bytes(b"\xff\xd8garbage") is None


def test_corrupt_and_non_jpeg_return_none(tmp_path, jpeg_dir):
    bad = str(tmp_path / "bad.jpg")
    with open(bad, "wb") as f:
        f.write(b"\xff\xd8\xff\xe0" + os.urandom(64))
    assert njpeg.read_image(bad) is None
    assert njpeg.read_batch_prepped([jpeg_dir[0], bad], 256, 224) is None
    png = str(tmp_path / "img.png")
    cv2.imwrite(png, np.zeros((8, 8, 3), np.uint8))
    assert njpeg.read_image(png) is None  # extension-gated


def test_truncated_jpeg_no_crash(tmp_path, jpeg_dir):
    with open(jpeg_dir[0], "rb") as f:
        raw = f.read()
    trunc = str(tmp_path / "trunc.jpg")
    with open(trunc, "wb") as f:
        f.write(raw[:len(raw) // 2])
    # libjpeg may error or emit a partial image — either is fine, just no
    # abort/exit (the default libjpeg handler would kill the process)
    out = njpeg.read_image(trunc)
    assert out is None or out.shape[2] == 3


def test_read_image_fallback_chain(tmp_path):
    # datasets.read_image: png goes through cv2, missing file raises
    from workoutdetector_tpu.data.datasets import read_image
    png = str(tmp_path / "x.png")
    cv2.imwrite(png, np.full((8, 8, 3), 7, np.uint8))
    img = read_image(png)
    assert img.shape == (8, 8, 3)
    with pytest.raises(FileNotFoundError):
        read_image(str(tmp_path / "missing.jpg"))


def test_renamed_png_in_batch_falls_back(tmp_path):
    """A PNG masquerading as .jpg disqualifies the native batch; the
    dataset's per-frame fallback still reads it via cv2."""
    from workoutdetector_tpu.data.datasets import _read_clip
    from workoutdetector_tpu.data.transforms import TestTransform
    rgb = np.zeros((300, 400, 3), np.uint8)
    rgb[:, :, 0] = 200
    fake = str(tmp_path / "img_00001.jpg")
    ok = str(tmp_path / "img_00002.jpg")
    cv2.imwrite(str(tmp_path / "real.png"), cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
    os.replace(str(tmp_path / "real.png"), fake)
    cv2.imwrite(ok, cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
    assert njpeg.read_batch_prepped([fake, ok], 256, 224) is None
    clip = _read_clip([fake, ok], TestTransform(size=224, scale=256),
                      np.random.default_rng(0))
    assert clip.shape == (2, 224, 224, 3)
    assert clip[0, :, :, 0].mean() > 150  # red channel survived


def test_frame_dataset_native_vs_host(tmp_path):
    """FrameDataset with TestTransform: native in-decoder path within
    tolerance of the forced-host path, same shapes/labels."""
    from workoutdetector_tpu.data.datasets import FrameDataset
    from workoutdetector_tpu.data.transforms import TestTransform
    rng = np.random.default_rng(1)
    vdir = tmp_path / "vid_a"
    vdir.mkdir()
    for i in range(1, 9):
        img = rng.integers(0, 256, size=(40, 52, 3), dtype=np.uint8)
        img = cv2.resize(img, (416, 320), interpolation=cv2.INTER_CUBIC)
        cv2.imwrite(str(vdir / f"img_{i:05}.jpg"), img)
    anno = tmp_path / "anno.txt"
    anno.write_text("vid_a 1 8 3\n")
    ds = FrameDataset(str(tmp_path), str(anno), num_segments=4,
                      transform=TestTransform(size=224, scale=256),
                      is_test=True)
    clip, label = ds.__getitem__(0, np.random.default_rng(0))
    assert clip.shape == (4, 224, 224, 3) and label == 3

    import workoutdetector_tpu.data.jpeg as j
    orig = j.read_batch_prepped
    j.read_batch_prepped = lambda *a, **k: None  # force host path
    try:
        host_clip, _ = ds.__getitem__(0, np.random.default_rng(0))
    finally:
        j.read_batch_prepped = orig
    diff = np.abs(clip.astype(int) - host_clip.astype(int))
    assert diff.mean() < 8.0


def test_train_transform_uses_full_decode(tmp_path):
    """TrainTransform (host MultiScaleCrop) must NOT take the in-decoder
    path — crops need full frames."""
    from workoutdetector_tpu.data.datasets import _prepped_params
    from workoutdetector_tpu.data.transforms import (TestTransform,
                                                     TrainTransform)
    assert _prepped_params(TrainTransform()) is None
    assert _prepped_params(None) is None
    assert _prepped_params(TestTransform(size=224, scale=256)) == (256, 224)
    assert _prepped_params(TestTransform(size=256, scale=256)) == (256, 256)
    # person-crop variant needs raw frames
    assert _prepped_params(TestTransform(person_crop=lambda c: c)) is None
