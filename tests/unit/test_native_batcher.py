"""Native C++ batch assembler vs the numpy reference path."""

import numpy as np
import pytest

from tacotron_tpu.config import AudioConfig
from tacotron_tpu.data import ljspeech
from tacotron_tpu.data.loader import DataLoader, Dataset
from tacotron_tpu.native import load_batcher

ACFG = AudioConfig(n_fft=512, win_length=400, hop_length=128, n_mels=20)


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    corpus = tmp_path_factory.mktemp("corpus")
    data = tmp_path_factory.mktemp("data")
    ljspeech.generate_synthetic_corpus(str(corpus), n=10, min_sec=0.3, max_sec=0.7)
    ljspeech.preprocess(str(corpus), str(data), ACFG, chunk=4)
    return str(data)


def test_native_builds():
    assert load_batcher() is not None, "g++ build of the native batcher failed"


def test_native_matches_numpy_batches(data_dir):
    ds = Dataset(data_dir)
    dl_np = DataLoader(ds, batch_size=4, num_buckets=2, r=5, use_native=False)
    dl_nat = DataLoader(ds, batch_size=4, num_buckets=2, r=5, use_native=True)
    assert dl_nat.native is not None

    for b_np, b_nat in zip(dl_np.epoch(shuffle=False), dl_nat.epoch(shuffle=False)):
        np.testing.assert_array_equal(b_np.text, b_nat.text)
        np.testing.assert_array_equal(b_np.text_len, b_nat.text_len)
        np.testing.assert_array_equal(b_np.frame_len, b_nat.frame_len)
        # f16->f32 conversion must be bit-exact vs numpy astype
        np.testing.assert_array_equal(b_np.mel, b_nat.mel)
        np.testing.assert_array_equal(b_np.linear, b_nat.linear)


def test_half_to_float_exhaustive():
    """Every possible f16 bit pattern must decode bit-exactly like numpy's
    astype(float32) — including subnormals (historical off-by-one in the
    normalized exponent halved every subnormal) and inf/nan payloads."""
    from tacotron_tpu.native.binding import NativeBatcher

    n_mels = 16
    all_bits = np.arange(1 << 16, dtype=np.uint16)
    mels = all_bits.view(np.float16).reshape(-1, n_mels)
    n_frames = mels.shape[0]

    class _Stub:
        pass

    ds = _Stub()
    ds.mels = mels
    ds.linears = mels.copy()
    ds.texts = np.zeros(4, np.int32)
    ds.index = [dict(text_offset=0, text_len=4,
                     frame_offset=0, n_frames=n_frames)]
    nb = NativeBatcher(ds)
    _, _, out_mel, out_lin, _ = nb.assemble(
        np.array([0], np.int32), text_pad=4, frame_pad=n_frames)

    want = mels.astype(np.float32)
    np.testing.assert_array_equal(out_mel[0].view(np.uint32),
                                  want.view(np.uint32))
    np.testing.assert_array_equal(out_lin[0].view(np.uint32),
                                  want.view(np.uint32))


def test_native_handles_oversize_clipping(data_dir):
    ds = Dataset(data_dir)
    dl = DataLoader(ds, batch_size=2, num_buckets=1, r=5, use_native=True,
                    drop_oversize=False)
    for batch in dl.epoch(shuffle=False):
        spec = dl.buckets[batch.bucket]
        assert (batch.frame_len <= spec.n_frames).all()
        assert (batch.text_len <= spec.text_len).all()


def test_f16_passthrough_matches_f32_conversion(data_dir):
    """The f16 wire mode must gather/pad the exact stored half bits: casting
    its output to f32 equals the legacy host-converted f32 output."""
    from tacotron_tpu.data.loader import DataLoader, Dataset
    from tacotron_tpu.native import NativeBatcher

    ds = Dataset(data_dir)
    nb = NativeBatcher(ds)
    items = list(range(min(4, len(ds))))
    t16, tl16, m16, l16, fl16 = nb.assemble(items, 24, 64, dtype=np.float16)
    t32, tl32, m32, l32, fl32 = nb.assemble(items, 24, 64, dtype=np.float32)
    assert m16.dtype == np.float16 and l16.dtype == np.float16
    np.testing.assert_array_equal(t16, t32)
    np.testing.assert_array_equal(tl16, tl32)
    np.testing.assert_array_equal(fl16, fl32)
    np.testing.assert_array_equal(m16.astype(np.float32), m32)
    np.testing.assert_array_equal(l16.astype(np.float32), l32)
