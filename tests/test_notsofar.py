"""NOTSOFAR meeting-dir loader on a synthesized directory."""

import json

import numpy as np

from ts_asr_whisper_tpu.data.audio import save_wav
from ts_asr_whisper_tpu.data.notsofar import load_data, sessions_to_cutset


def _make_meeting(root, name):
    d = root / name
    d.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for wav in ("sc_dev1.wav", "ct_head.wav"):
        save_wav(str(d / wav), rng.standard_normal(16000).astype(np.float32) * 0.1,
                 16000)
    with open(d / "devices.json", "w") as f:
        json.dump([
            {"device_name": "dev1", "is_close_talk": False, "is_mc": False,
             "wav_file_names": "sc_dev1.wav"},
            {"device_name": "head0", "is_close_talk": True, "is_mc": False,
             "wav_file_names": "ct_head.wav"},
        ], f)
    with open(d / "gt_transcription.json", "w") as f:
        json.dump([
            {"start_time": 0.1, "end_time": 0.6, "text": "hello there",
             "speaker_id": "alice"},
            {"start_time": 0.5, "end_time": 0.9, "text": "hi again",
             "speaker_id": "bob"},
        ], f)
    with open(d / "gt_meeting_metadata.json", "w") as f:
        json.dump({"meeting_id": name, "MtgType": "natural"}, f)


def test_load_data_and_cutset(tmp_path):
    for name in ("MTG_001", "MTG_002"):
        _make_meeting(tmp_path, name)
    sessions, gt, meta = load_data(str(tmp_path))
    assert len(sessions) == 2  # close-talk dropped
    assert sessions.session_id.str.startswith("singlechannel/").all()
    assert len(gt) == 4
    assert len(meta) == 2

    cs = sessions_to_cutset(sessions, gt)
    assert len(cs) == 2
    assert {s.speaker for s in cs[0].supervisions} == {"alice", "bob"}

    # close-talk view for supervision
    ct, gt2, _ = load_data(str(tmp_path), return_close_talk=True)
    assert (ct.device_name == "close_talk").all()

    # query filtering
    some, _, _ = load_data(str(tmp_path),
                           session_query="meeting_id == 'MTG_001'")
    assert len(some) == 1


def test_close_talk_concat(tmp_path):
    """concat_speech_segments equivalent: GT spans are concatenated into a
    new wav and the GT timings are shifted onto the concatenated timeline
    (reference wer_utils.py:352-402)."""
    from ts_asr_whisper_tpu.data.audio import load_audio

    name = "MTG_CT"
    d = tmp_path / name
    d.mkdir(parents=True)
    sr = 16000
    rng = np.random.default_rng(1)
    save_wav(str(d / "ct_head.wav"),
             rng.standard_normal(2 * sr).astype(np.float32) * 0.1, sr)
    with open(d / "devices.json", "w") as f:
        json.dump([{"device_name": "head0", "is_close_talk": True,
                    "is_mc": False, "wav_file_names": "ct_head.wav"}], f)
    with open(d / "gt_transcription.json", "w") as f:
        json.dump([
            {"start_time": 0.25, "end_time": 0.75, "text": "hello",
             "speaker_id": "alice", "ct_wav_file_name": "ct_head.wav",
             "word_timing": [["hello", 0.25, 0.75]]},
            {"start_time": 1.0, "end_time": 1.5, "text": "world",
             "speaker_id": "alice", "ct_wav_file_name": "ct_head.wav",
             "word_timing": [["world", 1.0, 1.5]]},
        ], f)

    out = tmp_path / "out"
    sessions, gt, _ = load_data(str(tmp_path), return_close_talk=True,
                                out_dir=str(out))
    wavs = sessions.iloc[0]["wav_file_names"]
    assert len(wavs) == 1 and "concat_close_talk" in wavs[0]
    samples, sr2 = load_audio(wavs[0])
    # concatenated wav = exactly the two 0.5 s spans back to back
    assert sr2 == sr and samples.shape[-1] == sr  # 1.0 s total
    # GT retimed: first span starts at 0, second right after the first
    assert abs(gt.iloc[0]["start_time"] - 0.0) < 1e-9
    assert abs(gt.iloc[0]["end_time"] - 0.5) < 1e-9
    assert abs(gt.iloc[1]["start_time"] - 0.5) < 1e-9
    assert abs(gt.iloc[1]["end_time"] - 1.0) < 1e-9
    assert gt.iloc[1]["word_timing"] == [["world", 0.5, 1.0]]
