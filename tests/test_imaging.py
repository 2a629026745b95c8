import numpy as np
import pytest

from spider_ray.kernels.imaging import (
    decode_image,
    encode_image,
    phash64,
    png_decode,
    png_encode,
    psnr,
    qimg_decode,
    qimg_encode,
)


def _img(seed=0, h=48, w=64, ch=3):
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 256, size=(h, w, ch)).astype(np.uint8)
    # smooth a bit so it's image-like
    sm = base.astype(np.float64)
    sm = (sm + np.roll(sm, 1, 0) + np.roll(sm, 1, 1)) / 3
    return sm.astype(np.uint8)


def test_png_roundtrip_rgb():
    img = _img(1)
    assert (png_decode(png_encode(img)) == img).all()


def test_png_roundtrip_gray_and_rgba():
    g = _img(2)[:, :, 0]
    assert (png_decode(png_encode(g)) == g).all()
    a = np.dstack([_img(3), _img(4)[:, :, :1]])
    assert (png_decode(png_encode(a)) == a).all()


def test_png_rejects_garbage():
    with pytest.raises(ValueError):
        png_decode(b"not a png at all")


def test_qimg_psnr_above_40db():
    img = _img(5)
    dec = qimg_decode(qimg_encode(img))
    assert dec.shape == img.shape
    p = psnr(img, dec)
    assert p >= 40.0, p


def test_decode_image_dispatch_and_stub():
    img = _img(6)
    assert (decode_image(encode_image(img, "png"), "png") == img).all()
    assert psnr(img, decode_image(encode_image(img, "jpeg"), "jpeg")) >= 40
    with pytest.raises(NotImplementedError):
        decode_image(b"xx", "gif")


def test_phash_locality():
    img = _img(7)
    h1 = phash64(img)
    assert h1 == phash64(img)
    # lossy roundtrip barely moves the hash
    dec = qimg_decode(qimg_encode(img))
    d_close = bin(h1 ^ phash64(dec)).count("1")
    assert d_close <= 8, d_close
    # different image is far
    d_far = bin(h1 ^ phash64(_img(8))).count("1")
    assert d_far > d_close
