"""Observability parity: joint-decode debug dump + eval prediction tables
(reference analyze_predictions decoding.py:214-266 and write_wandb_pred
evaluation.py:37-51)."""

import json

import numpy as np

import jax
import jax.numpy as jnp


def test_joint_debug_dump_prints_topk_tables(capfd):
    """CTCRescorer(debug=True) emits the per-step ATT/CTC/NEXT top-k dump
    through jax.debug.callback — inside jit, zero-cost when off."""
    from ts_asr_whisper_tpu.decoding.ctc_rescorer import (
        CTCRescorer,
        init_ctc_state,
        set_joint_debug_decoder,
    )

    rng = np.random.default_rng(0)
    v = 32           # ctc vocab (blank = last)
    v_dec = v - 1    # decoder vocab
    enc_logits = jnp.asarray(rng.standard_normal((1, 12, v)), jnp.float32)
    state = init_ctc_state(enc_logits, blank=v - 1)
    rescorer = CTCRescorer(blank_id=v - 1, eos_id=0, timestamp_begin=20,
                           ctc_weight=0.3, k=5, prefix_len=1, debug=True)
    set_joint_debug_decoder(None)  # id-only printing

    tokens = jnp.zeros((1, 8), jnp.int32)
    scores = jnp.asarray(rng.standard_normal((1, v_dec)), jnp.float32)
    fused, _ = jax.jit(rescorer.rescore)(state, tokens,
                                         jnp.asarray(4), scores)
    np.asarray(fused)  # force execution so the callback fires
    out = capfd.readouterr().out
    for section in ("HYPOTHESIS 0", "PREFIX:", "ATT_TOKENS", "CTC_TOKENS",
                    "NEXT_TOKENS", "CTC_EOS"):
        assert section in out, (section, out[-500:])

    # off by default: no dump
    quiet = CTCRescorer(blank_id=v - 1, eos_id=0, timestamp_begin=20,
                        ctc_weight=0.3, k=5, prefix_len=1)
    fused, _ = jax.jit(quiet.rescore)(state, tokens, jnp.asarray(4), scores)
    np.asarray(fused)
    assert "ATT_TOKENS" not in capfd.readouterr().out


def test_joint_debug_flag_plumbs_from_config():
    from ts_asr_whisper_tpu.config import load_config

    cfg = load_config(["decoding.joint_decode_debug=true"], n_devices=1)
    assert cfg.decoding.joint_decode_debug is True
    from ts_asr_whisper_tpu.decoding.generation_config import GenerationConfig

    assert GenerationConfig().joint_debug is False
    assert GenerationConfig(joint_debug=True).joint_debug is True


def test_log_predictions_artifact_and_cap(tmp_path):
    from ts_asr_whisper_tpu.utils.observability import MetricsLogger

    logger = MetricsLogger(str(tmp_path))
    hyps = [f"hyp {i}" for i in range(20)]
    refs = [f"ref {i}" for i in range(20)]
    path = logger.log_predictions(hyps, refs, step=7, rows_to_log=10,
                                  tag="dev")
    logger.close()
    assert path.name == "eval_predictions_dev_step7.jsonl"
    rows = [json.loads(line) for line in path.read_text().splitlines()]
    assert len(rows) == 10  # capped like the reference's rows_to_log
    assert rows[0] == {"id": 0, "label_str": "ref 0", "hyp_str": "hyp 0"}
    assert rows[9]["hyp_str"] == "hyp 9"
