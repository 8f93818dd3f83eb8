import numpy as np
import jax, jax.numpy as jnp
from ts_asr_whisper_tpu.decoding.generation_config import GenerationConfig
from ts_asr_whisper_tpu.decoding.beam import beam_search
from ts_asr_whisper_tpu.decoding.longform import _encoder_jit, _ctc_logits_jit
from ts_asr_whisper_tpu.decoding.ctc_rescorer import CTCRescorer, init_ctc_state
from ts_asr_whisper_tpu.models.config import make_config
from ts_asr_whisper_tpu.models.convert import cast_params
from ts_asr_whisper_tpu.models.dicow import init_dicow
from ts_asr_whisper_tpu.ops.attention import set_attention_impl

set_attention_impl("pallas")
cfg = make_config("large-v3-turbo", ctc_weight=0.3, use_fddt=True,
                  use_pre_pos_fddt=True, non_target_fddt_value=0.5, dtype="bfloat16")
params = cast_params(init_dicow(jax.random.PRNGKey(0), cfg), jnp.bfloat16)
b = 8
window = jnp.asarray(np.random.default_rng(0).standard_normal((b, 128, 3000)).astype(np.float32))
stno = jnp.full((b, 4, 1500), 0.25, jnp.float32)
enc = _encoder_jit(params["encoder"], cfg, window, stno)
enc_logits = _ctc_logits_jit(params["encoder"], cfg, enc)
gen = GenerationConfig(return_timestamps=True, max_length=448, num_beams=5,
                       ctc_weight=0.2, length_penalty=0.1)
blank = cfg.ctc_vocab_size - 1
scorer = CTCRescorer(blank_id=blank, eos_id=gen.eos_token_id,
                     timestamp_begin=gen.timestamp_begin, ctc_weight=0.2,
                     k=min(500, gen.timestamp_begin - 1), prefix_len=3)
prompts = jnp.tile(jnp.asarray([[50258, 50259, 50360]], jnp.int32), (b, 1))

def run():
    state = init_ctc_state(enc_logits, blank, None, num_beams=5, k=scorer.k)
    return beam_search(params, cfg, gen, enc, prompts, 128, num_beams=5,
                       ctc_scorer=scorer, ctc_state=state)

out = run()
jax.device_get(jnp.ravel(out.sequences)[:1])
with jax.profiler.trace("/tmp/beam_trace"):
    out = run()
    jax.device_get(jnp.ravel(out.sequences)[:1])
print("done")
