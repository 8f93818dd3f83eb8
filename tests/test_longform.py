"""Long-form orchestration: segment retrieval + timestamp re-blocking parity
vs the reference's host logic, and an end-to-end seek-loop smoke test."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ts_asr_whisper_tpu.decoding import longform as lf  # noqa: E402

from oracles import load_reference_dicow  # noqa: E402

RefConfig, RefModel = load_reference_dicow()
import sys  # noqa: E402

sys.path.insert(0, "/root/reference/src")
from models.dicow.generation import DiCoWGenerationMixin  # noqa: E402

TS = 1000  # timestamp_begin for these tests
PAD = 7


def _ref_retrieve(seq, seek_num_frames, time_offset):
    seek_sequence = torch.tensor(seq)
    segments, seg_offset = DiCoWGenerationMixin._retrieve_segment(
        seek_sequence=seek_sequence,
        seek_outputs=[{}],
        time_offset=torch.tensor([time_offset], dtype=torch.float64),
        timestamp_begin=TS,
        seek_num_frames=torch.tensor([seek_num_frames]),
        time_precision=0.02,
        time_precision_features=0.01,
        input_stride=2,
        prev_idx=0,
        idx=0,
        return_token_timestamps=False,
        decoder_input_ids=torch.zeros((1, 3), dtype=torch.long),
    )
    out = [(float(s["start"]), float(s["end"]), list(map(int, s["tokens"])))
           for s in segments]
    return out, int(seg_offset)


CASES = [
    # paired timestamps, single-timestamp ending
    [TS + 0, 5, 6, TS + 100, TS + 100, 8, 9, TS + 200, TS + 250],
    # paired timestamps, unfinished tail (seek back to last pair)
    [TS + 0, 5, 6, TS + 100, TS + 100, 8, 9, TS + 200],
    # no consecutive pairs, two timestamps
    [TS + 0, 5, 6, 9, TS + 400],
    # one timestamp only, within window
    [TS + 10, 5, 6],
    # one timestamp beyond 200 -> rollback
    [TS + 300, 5],
    # no timestamps at all
    [5, 6, 9],
]


@pytest.mark.parametrize("case", range(len(CASES)))
def test_retrieve_segment_parity(case):
    seq = CASES[case]
    ref_segs, ref_off = _ref_retrieve(seq, seek_num_frames=3000, time_offset=30.0)
    segs, off = lf.retrieve_segment(np.asarray(seq), TS, 3000, 30.0)
    assert off == ref_off
    assert len(segs) == len(ref_segs)
    for s, (rs, re_, rt) in zip(segs, ref_segs):
        assert abs(s.start - rs) < 1e-9
        assert abs(s.end - re_) < 1e-9
        assert list(map(int, s.tokens)) == rt


class MockTokenizer:
    """Round-trip tokenizer for the reference's decode->re-encode path:
    text tokens render as ' #<id>' and timestamps as '<|t.tt|>'."""

    pad_token_id = PAD

    def get_vocab(self):
        return {"<|0.00|>": TS, "Ġ": 220}

    def decode(self, tokens):
        # the real WhisperTokenizer.decode filters timestamp ids
        return "".join(f"#{int(t)};" for t in tokens if int(t) < TS)

    def __call__(self, text):
        import re

        ids = []
        for m in re.finditer(r"<\|(\d+\.\d+)\|>|#(\d+);", text):
            if m.group(1) is not None:
                ids.append(TS + round(float(m.group(1)) / 0.02))
            else:
                ids.append(int(m.group(2)))
        return {"input_ids": ids}


def _seg(start, end, tokens):
    return {"start": torch.tensor(start, dtype=torch.float64),
            "end": torch.tensor(end, dtype=torch.float64),
            "tokens": list(tokens)}


SCENARIOS = [
    # simple segments within the first block
    [[_seg(0.0, 3.5, [TS + 0, 11, 12, TS + 175]),
      _seg(4.0, 7.0, [TS + 200, 13, TS + 350])]],
    # segment crossing a 30 s boundary (wrap with correction)
    [[_seg(25.0, 33.0, [11, 12]), _seg(34.0, 35.5, [13])]],
    # long gap skipping whole blocks (dummy bridges)
    [[_seg(2.0, 4.0, [11]), _seg(95.0, 97.0, [12, 13])]],
    # first segment starts after 30 s
    [[_seg(65.0, 68.0, [11])]],
    # exact 30 s landing
    [[_seg(28.0, 30.0, [11]), _seg(30.0, 31.0, [12])]],
    # exactly 30-long segment wrap
    [[_seg(10.0, 40.0, [11, 12])]],
    # dummy-only segment gets filtered
    [[_seg(0.0, 0.0, [TS]), _seg(1.0, 2.0, [11])]],
]


@pytest.mark.parametrize("scenario", range(len(SCENARIOS)))
def test_fix_timestamps_parity(scenario):
    segs_torch = SCENARIOS[scenario]

    class DummySelf:
        tokenizer = MockTokenizer()
        round_to_nearest_0_02 = staticmethod(
            DiCoWGenerationMixin.round_to_nearest_0_02)

    sequences = {"segments": [list(s) for s in segs_torch],
                 "sequences": torch.zeros(1, 1)}
    ref_out = DiCoWGenerationMixin._fix_timestamps_from_segmentation(
        DummySelf(), sequences).numpy()

    ours_segs = [[lf.Segment(start=float(s["start"]), end=float(s["end"]),
                             tokens=np.asarray(s["tokens"]))
                  for s in row] for row in segs_torch]
    ours = lf.fix_timestamps_from_segmentation(ours_segs, TS, PAD,
                                               empty_token_id=220)
    assert ours.shape == ref_out.shape, (ours, ref_out)
    np.testing.assert_array_equal(ours, ref_out)


def test_longform_end_to_end_smoke(rng):
    """Two 'recordings' longer than one window; the seek loop must cover all
    audio and emit within-block timestamps."""
    import jax.numpy as jnp  # noqa: F401

    from ts_asr_whisper_tpu.decoding.generation_config import GenerationConfig
    from ts_asr_whisper_tpu.models.config import DiCoWConfig
    from ts_asr_whisper_tpu.models.dicow import init_dicow
    import jax

    V = 1700
    ts_begin = V - 1501
    no_ts = ts_begin - 1
    cfg = DiCoWConfig(
        vocab_size=V, num_mel_bins=24, d_model=32, encoder_layers=1,
        decoder_layers=1, encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_ffn_dim=64, decoder_ffn_dim=64, max_source_positions=48,
        max_target_positions=64, decoder_start_token_id=31, eos_token_id=30,
        pad_token_id=30, bos_token_id=30, dtype="float32",
        use_fddt=True, use_pre_pos_fddt=True)
    params = init_dicow(jax.random.PRNGKey(0), cfg)
    gen_cfg = GenerationConfig(
        eos_token_id=30, pad_token_id=30, bos_token_id=30,
        decoder_start_token_id=31, no_timestamps_token_id=no_ts,
        return_timestamps=True, max_length=20)

    t_total = 96 * 3  # three windows
    feats = rng.standard_normal((2, 24, t_total)).astype(np.float32)
    stno = rng.random((2, 4, t_total // 2)).astype(np.float32)
    stno /= stno.sum(axis=1, keepdims=True)
    attn = np.ones((2, t_total), dtype=np.int32)
    attn[1, 96 * 2:] = 0  # second recording is shorter
    prompts = np.array([[31, 50], [31, 50]], dtype=np.int32)

    out = lf.longform_generate(params, cfg, gen_cfg, feats, stno, attn,
                               prompts, max_new_tokens=10,
                               return_segments=True)
    assert out.sequences.ndim == 2 and out.sequences.shape[0] == 2
    # all emitted timestamps must be within [0, 30] of a block
    for row in out.sequences:
        for t in row:
            if t >= ts_begin:
                assert t <= ts_begin + 1500


def test_longform_beam_joint_ctc_smoke(rng):
    """Beam + joint CTC through the seek loop."""
    from ts_asr_whisper_tpu.decoding.generation_config import GenerationConfig
    from ts_asr_whisper_tpu.models.config import DiCoWConfig
    from ts_asr_whisper_tpu.models.dicow import init_dicow
    import jax

    V = 1700
    ts_begin = V - 1501
    cfg = DiCoWConfig(
        vocab_size=V, num_mel_bins=24, d_model=32, encoder_layers=1,
        decoder_layers=1, encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_ffn_dim=64, decoder_ffn_dim=64, max_source_positions=48,
        max_target_positions=64, decoder_start_token_id=31, eos_token_id=30,
        pad_token_id=30, bos_token_id=30, dtype="float32",
        use_fddt=True, use_pre_pos_fddt=True, ctc_weight=0.3,
        additional_self_attention_layer=True, pre_ctc_sub_sample=True)
    params = init_dicow(jax.random.PRNGKey(1), cfg)
    gen_cfg = GenerationConfig(
        eos_token_id=30, pad_token_id=30, bos_token_id=30,
        decoder_start_token_id=31, no_timestamps_token_id=ts_begin - 1,
        return_timestamps=True, max_length=20, num_beams=2, ctc_weight=0.2,
        length_penalty=0.1)

    t_total = 96 * 2
    feats = rng.standard_normal((2, 24, t_total)).astype(np.float32)
    stno = rng.random((2, 4, t_total // 2)).astype(np.float32)
    stno /= stno.sum(axis=1, keepdims=True)
    attn = np.ones((2, t_total), dtype=np.int32)
    prompts = np.array([[31, 50, 51], [31, 50, 51]], dtype=np.int32)

    out = lf.longform_generate(params, cfg, gen_cfg, feats, stno, attn,
                               prompts, max_new_tokens=8)
    assert out.sequences.shape[0] == 2


def test_longform_compaction_varied_lengths(rng):
    """Recordings of very different lengths: the active-row compaction must
    still produce per-row coverage identical to full-batch processing."""
    from ts_asr_whisper_tpu.decoding.generation_config import GenerationConfig
    from ts_asr_whisper_tpu.models.config import DiCoWConfig
    from ts_asr_whisper_tpu.models.dicow import init_dicow
    import jax

    V = 1700
    ts_begin = V - 1501
    cfg = DiCoWConfig(
        vocab_size=V, num_mel_bins=24, d_model=32, encoder_layers=1,
        decoder_layers=1, encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_ffn_dim=64, decoder_ffn_dim=64, max_source_positions=48,
        max_target_positions=64, decoder_start_token_id=31, eos_token_id=30,
        pad_token_id=30, bos_token_id=30, dtype="float32",
        use_fddt=True, use_pre_pos_fddt=True)
    params = init_dicow(jax.random.PRNGKey(2), cfg)
    gen_cfg = GenerationConfig(
        eos_token_id=30, pad_token_id=30, bos_token_id=30,
        decoder_start_token_id=31, no_timestamps_token_id=ts_begin - 1,
        return_timestamps=True, max_length=20)

    b = 5
    t_total = 96 * 4
    feats = rng.standard_normal((b, 24, t_total)).astype(np.float32)
    stno = rng.random((b, 4, t_total // 2)).astype(np.float32)
    stno /= stno.sum(axis=1, keepdims=True)
    attn = np.zeros((b, t_total), dtype=np.int32)
    lengths = [96 * 4, 96 * 1, 96 * 3, 50, 96 * 2]  # very unequal
    for i, n in enumerate(lengths):
        attn[i, :n] = 1
    prompts = np.tile(np.array([[31, 50]], dtype=np.int32), (b, 1))

    out = lf.longform_generate(params, cfg, gen_cfg, feats, stno, attn,
                               prompts, max_new_tokens=8,
                               return_segments=True)
    assert out.sequences.shape[0] == b
    # every row was decoded (segments may be empty for pure-noise audio, but
    # the seek loop must have consumed all frames without error)
    assert len(out.segments) == b


def test_longform_temperature_fallback(rng):
    """With an impossible logprob threshold and multiple temperatures, the
    fallback path re-decodes with sampling and still completes."""
    from ts_asr_whisper_tpu.decoding.generation_config import GenerationConfig
    from ts_asr_whisper_tpu.models.config import DiCoWConfig
    from ts_asr_whisper_tpu.models.dicow import init_dicow
    import jax

    V = 1700
    ts_begin = V - 1501
    cfg = DiCoWConfig(
        vocab_size=V, num_mel_bins=24, d_model=32, encoder_layers=1,
        decoder_layers=1, encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_ffn_dim=64, decoder_ffn_dim=64, max_source_positions=48,
        max_target_positions=64, decoder_start_token_id=31, eos_token_id=30,
        pad_token_id=30, bos_token_id=30, dtype="float32",
        use_fddt=True, use_pre_pos_fddt=True)
    params = init_dicow(jax.random.PRNGKey(4), cfg)
    gen_cfg = GenerationConfig(
        eos_token_id=30, pad_token_id=30, bos_token_id=30,
        decoder_start_token_id=31, no_timestamps_token_id=ts_begin - 1,
        return_timestamps=True, max_length=20,
        temperature=(0.0, 0.4, 0.8),
        logprob_threshold=10.0)  # impossible: every row falls back

    t_total = 96
    feats = rng.standard_normal((2, 24, t_total)).astype(np.float32)
    stno = rng.random((2, 4, t_total // 2)).astype(np.float32)
    stno /= stno.sum(axis=1, keepdims=True)
    attn = np.ones((2, t_total), dtype=np.int32)
    prompts = np.array([[31, 50], [31, 50]], dtype=np.int32)

    out = lf.longform_generate(params, cfg, gen_cfg, feats, stno, attn,
                               prompts, max_new_tokens=8)
    assert out.sequences.shape[0] == 2


def test_needs_fallback_checks():
    from ts_asr_whisper_tpu.decoding.generation_config import GenerationConfig
    from ts_asr_whisper_tpu.decoding.longform import _needs_fallback

    gc = GenerationConfig(logprob_threshold=-1.0,
                          compression_ratio_threshold=2.4)
    V = 1700
    # low avg logprob -> fallback
    assert _needs_fallback(np.array([5, 6, 7]), -2.0, gc, V)
    # fine logprob, incompressible tokens -> no fallback
    assert not _needs_fallback(np.arange(50) * 31 % 1690, -0.5, gc, V)
    # hugely repetitive tokens -> compression ratio fires
    assert _needs_fallback(np.array([7] * 400), -0.5, gc, V)


def test_compression_ratio_matches_hf():
    """Byte-exact vs HF _retrieve_compression_ratio (token bytes, not text)."""
    torch = pytest.importorskip("torch")
    from transformers.models.whisper.generation_whisper import (
        WhisperGenerationMixin,
    )

    from ts_asr_whisper_tpu.decoding.longform import compression_ratio

    rng = np.random.default_rng(3)
    for v in (1700, 51866):
        for toks in (rng.integers(0, v, size=37),
                     np.array([9] * 123),
                     np.array([50257])):
            ref = WhisperGenerationMixin._retrieve_compression_ratio(
                torch.tensor(toks), v)
            assert compression_ratio(toks, v) == pytest.approx(float(ref))


def test_longform_mesh_dp_matches_unsharded(rng):
    """DP decode over a 4-device mesh must produce the exact token streams of
    the single-device path (sharding only changes placement, not math)."""
    from ts_asr_whisper_tpu.decoding.generation_config import GenerationConfig
    from ts_asr_whisper_tpu.models.config import DiCoWConfig
    from ts_asr_whisper_tpu.models.dicow import init_dicow
    from ts_asr_whisper_tpu.parallel.mesh import make_mesh
    import jax

    V = 1700
    ts_begin = V - 1501
    cfg = DiCoWConfig(
        vocab_size=V, num_mel_bins=24, d_model=32, encoder_layers=1,
        decoder_layers=1, encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_ffn_dim=64, decoder_ffn_dim=64, max_source_positions=48,
        max_target_positions=64, decoder_start_token_id=31, eos_token_id=30,
        pad_token_id=30, bos_token_id=30, dtype="float32",
        use_fddt=True, use_pre_pos_fddt=True)
    params = init_dicow(jax.random.PRNGKey(2), cfg)
    gen_cfg = GenerationConfig(
        eos_token_id=30, pad_token_id=30, bos_token_id=30,
        decoder_start_token_id=31, no_timestamps_token_id=ts_begin - 1,
        return_timestamps=True, max_length=20)

    b = 6  # not a multiple of 4: exercises the bucket round-up
    t_total = 96 * 3
    feats = rng.standard_normal((b, 24, t_total)).astype(np.float32)
    stno = rng.random((b, 4, t_total // 2)).astype(np.float32)
    stno /= stno.sum(axis=1, keepdims=True)
    attn = np.zeros((b, t_total), dtype=np.int32)
    lengths = [96 * 3, 96, 96 * 2, 50, 96 * 3, 96]
    for i, n in enumerate(lengths):
        attn[i, :n] = 1
    prompts = np.tile(np.array([[31, 50]], dtype=np.int32), (b, 1))

    base = lf.longform_generate(params, cfg, gen_cfg, feats, stno, attn,
                                prompts, max_new_tokens=8)
    mesh = make_mesh([4], devices=jax.devices()[:4])
    dp = lf.longform_generate(params, cfg, gen_cfg, feats, stno, attn,
                              prompts, max_new_tokens=8, mesh=mesh)
    np.testing.assert_array_equal(base.sequences, dp.sequences)


def test_slice_windows_dev_matches_host_semantics():
    """Device-side seek-window assembly == the original host reference
    semantics (mel tail zeroed beyond the valid length, STNO tail silence,
    odd seek offsets, short final windows, duplicate padded rows)."""
    import jax.numpy as jnp

    from ts_asr_whisper_tpu.decoding.longform import _slice_windows_dev

    rng = np.random.default_rng(0)
    b, m, t_total, nsf = 3, 6, 250, 100
    feats = rng.standard_normal((b, m, t_total)).astype(np.float32)
    stno = rng.random((b, 4, t_total // 2)).astype(np.float32)
    max_frames = np.array([250, 103, 160])
    seek = np.array([200, 31, 0])
    rows = np.array([0, 1, 2, 0])  # padded duplicate of row 0
    forced = np.tile(np.array([[7, 8, 9]], np.int32), (b, 1))

    n_mel = np.clip(max_frames[rows] - seek[rows], 0, nsf)
    n_stno = np.clip(max_frames[rows] // 2 - seek[rows] // 2, 0, nsf // 2)
    meta = np.stack([rows, seek[rows], n_mel, n_stno]).astype(np.int32)
    feats_dev = jnp.pad(jnp.asarray(feats), ((0, 0), (0, 0), (0, nsf)))
    stno_dev = jnp.pad(jnp.asarray(stno), ((0, 0), (0, 0), (0, nsf // 2)))
    win, sw, fr = _slice_windows_dev(feats_dev, stno_dev,
                                     jnp.asarray(forced), jnp.asarray(meta),
                                     nsf=nsf)
    win, sw, fr = np.asarray(win), np.asarray(sw), np.asarray(fr)

    for j, i in enumerate(rows):
        n = int(n_mel[j])
        exp = np.zeros((m, nsf), np.float32)
        exp[:, :n] = feats[i, :, seek[i]: seek[i] + n]
        np.testing.assert_array_equal(win[j], exp)
        take = int(n_stno[j])
        exp_s = np.zeros((4, nsf // 2), np.float32)
        exp_s[:, :take] = stno[i, :, seek[i] // 2: seek[i] // 2 + take]
        exp_s[0, take:] = 1.0  # tail = silence class
        np.testing.assert_array_equal(sw[j], exp_s)
        np.testing.assert_array_equal(fr[j], forced[i])
