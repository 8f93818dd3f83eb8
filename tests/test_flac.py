"""Native FLAC decoder (native/flac.cc) round-trip validation against the
independent pure-Python encoder in flac_writer.py, plus the load_audio
integration. Bit-exact reconstruction is asserted for every subframe type,
residual coding mode, stereo assignment, and bit depth the decoder claims."""

import numpy as np
import pytest

from flac_writer import encode_flac

from ts_asr_whisper_tpu.data.audio import load_audio
from ts_asr_whisper_tpu.data.flac import decode_flac_bytes
from ts_asr_whisper_tpu.eval.native import _load

pytestmark = pytest.mark.skipif(_load() is None,
                                reason="native library unavailable")


def _pcm(channels, n, bps=16, seed=0, smooth=True):
    rng = np.random.default_rng(seed)
    lim = 1 << (bps - 2)
    if smooth:  # correlated signal so FIXED/LPC residuals stay small
        x = np.cumsum(rng.integers(-200, 201, (channels, n)), axis=1)
        x = np.clip(x, -lim, lim - 1)
    else:
        x = rng.integers(-lim, lim, (channels, n))
    return x.astype(np.int64)


def _roundtrip(pcm, sr=16000, **kw):
    data = encode_flac(pcm, sr, **kw)
    out, sr2, bps2 = decode_flac_bytes(data)
    assert sr2 == sr
    np.testing.assert_array_equal(out.astype(np.int64), pcm)
    return data


@pytest.mark.parametrize("mode", ["verbatim", "fixed0", "fixed1", "fixed2",
                                  "fixed3", "fixed4", "lpc"])
def test_subframe_types_mono(mode):
    _roundtrip(_pcm(1, 5000, seed=3), subframe_mode=mode, block_size=1024)


def test_constant_subframe():
    pcm = np.full((1, 3000), -1234, np.int64)
    _roundtrip(pcm, subframe_mode="constant", block_size=1024)


@pytest.mark.parametrize("stereo", ["independent", "left_side",
                                    "right_side", "mid_side"])
def test_stereo_assignments(stereo):
    _roundtrip(_pcm(2, 4000, seed=5), subframe_mode="fixed2",
               stereo_mode=stereo, block_size=512)


@pytest.mark.parametrize("porder,rice2,escapes", [
    (0, False, ()), (2, False, ()), (3, True, ()),
    (2, False, (1,)), (1, True, (0, 1)),
])
def test_residual_codings(porder, rice2, escapes):
    _roundtrip(_pcm(1, 4096, seed=porder), subframe_mode="fixed2",
               block_size=2048, partition_order=porder, rice2=rice2,
               escape_partitions=escapes)


@pytest.mark.parametrize("bps", [8, 16, 24])
def test_bit_depths(bps):
    _roundtrip(_pcm(1, 2000, bps=bps, seed=bps), bps=bps,
               subframe_mode="fixed1", block_size=512)


def test_wasted_bits():
    pcm = (_pcm(1, 2048, seed=9) & ~np.int64(7))  # 3 trailing zero bits
    _roundtrip(pcm, subframe_mode="fixed2", wasted=3, block_size=1024)


def test_variable_blocking_and_multibyte_frame_numbers():
    # tiny blocks force many frames -> multi-byte UTF-8 sample numbers
    pcm = _pcm(1, 40 * 256, seed=11)
    _roundtrip(pcm, subframe_mode="fixed1", block_size=256,
               variable_blocking=True)
    _roundtrip(pcm, subframe_mode="fixed1", block_size=256,
               variable_blocking=False)


def test_unknown_total_samples():
    pcm = _pcm(1, 3000, seed=13)
    data = encode_flac(pcm, 16000, subframe_mode="fixed2", block_size=1024,
                       declare_total=False)
    out, sr, _ = decode_flac_bytes(data)
    np.testing.assert_array_equal(out.astype(np.int64), pcm)


def test_partial_final_block():
    pcm = _pcm(1, 2500, seed=17)  # 2500 = 2*1024 + 452
    _roundtrip(pcm, subframe_mode="fixed2", block_size=1024)


def test_load_audio_flac(tmp_path):
    pcm = _pcm(1, 16000, seed=21)
    path = tmp_path / "x.flac"
    path.write_bytes(encode_flac(pcm, 16000, subframe_mode="fixed2"))
    samples, sr = load_audio(str(path))
    assert sr == 16000 and samples.shape == (1, 16000)
    np.testing.assert_allclose(samples[0],
                               pcm[0].astype(np.float32) / 32768.0,
                               atol=1e-7)
    # slicing + resampling path
    sliced, sr2 = load_audio(str(path), offset=0.25, duration=0.5,
                             target_sr=8000)
    assert sr2 == 8000 and sliced.shape[1] == 4000


def test_corrupt_stream_rejected():
    with pytest.raises(ValueError):
        decode_flac_bytes(b"not a flac stream at all")
    pcm = _pcm(1, 1000, seed=1)
    data = bytearray(encode_flac(pcm, 16000, subframe_mode="fixed1",
                                 block_size=512))
    data[50] ^= 0xFF  # stomp STREAMINFO region -> either error or mismatch
    try:
        out, _, _ = decode_flac_bytes(bytes(data))
    except ValueError:
        pass


def test_unknown_total_highly_compressible():
    """CONSTANT frames compress ~700x: the decode buffer must grow on the
    decoder's capacity signal instead of rejecting the stream."""
    pcm = np.full((1, 60 * 16000), 123, np.int64)  # 60 s of DC
    data = encode_flac(pcm, 16000, subframe_mode="constant",
                       block_size=4096, declare_total=False)
    assert len(data) < 6000  # actually tiny on the wire
    out, sr, _ = decode_flac_bytes(data)
    np.testing.assert_array_equal(out.astype(np.int64), pcm)


def test_trailing_bytes_tolerated():
    """Appended tags/padding after the last frame must not discard the
    decoded audio (unknown-total streams cannot stop on a sample count)."""
    pcm = _pcm(1, 3000, seed=23)
    data = encode_flac(pcm, 16000, subframe_mode="fixed2", block_size=1024,
                       declare_total=False)
    data += b"\x00\x00TAGJUNK" * 3
    out, _, _ = decode_flac_bytes(data)
    np.testing.assert_array_equal(out.astype(np.int64), pcm)
