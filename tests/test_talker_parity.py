"""Numerical parity of the TPU talker stack against the reference
implementation (random weights, CPU float32, greedy decoding)."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from _reference import install_reference, tiny_talker_config_dict

install_reference()

from qwen_tts.core.models.configuration_qwen3_tts import (  # noqa: E402
    Qwen3TTSConfig, Qwen3TTSTalkerConfig)
from qwen_tts.core.models.modeling_qwen3_tts import (  # noqa: E402
    Qwen3TTSForConditionalGeneration, Qwen3TTSTalkerForConditionalGeneration)

from qwen3_tts_tpu.config import TalkerConfig, TTSConfig  # noqa: E402
from qwen3_tts_tpu.models.talker import (  # noqa: E402
    code_predictor_generate, talker_prefill, talker_spec)
from qwen3_tts_tpu.models.generation import (  # noqa: E402
    assemble_prompts, generate_frames, trim_codes)
from qwen3_tts_tpu.nn.cache import KVCache  # noqa: E402
from qwen3_tts_tpu.nn.sampling import SamplingConfig, make_suppress_mask  # noqa: E402
from qwen3_tts_tpu.utils.weights import convert_talker  # noqa: E402


@pytest.fixture(scope="module")
def ref_and_params():
    torch.manual_seed(0)
    cfg_d = tiny_talker_config_dict()
    ref_cfg = Qwen3TTSTalkerConfig(**cfg_d)
    ref = Qwen3TTSTalkerForConditionalGeneration(ref_cfg).eval().float()
    tpu_cfg = TalkerConfig.from_dict(cfg_d)
    params = jax.tree.map(jnp.asarray,
                          convert_talker({k: v.numpy() for k, v in ref.state_dict().items()},
                                         tpu_cfg, prefix=""))
    return ref, tpu_cfg, params


def test_prefill_logits_parity(ref_and_params):
    ref, cfg, params = ref_and_params
    b, t, h = 2, 6, cfg.hidden_size
    torch.manual_seed(1)
    embeds = torch.randn(b, t, h)
    # left-pad row 1 by 2
    mask = torch.ones(b, t, dtype=torch.long)
    mask[1, :2] = 0
    embeds[1, :2] = 0.0

    with torch.no_grad():
        position_ids, rope_deltas = ref.get_rope_index(mask)
        out = ref.model(inputs_embeds=embeds, attention_mask=mask,
                        position_ids=position_ids.long(), use_cache=False)
        ref_logits = ref.codec_head(out.last_hidden_state)

    spec = talker_spec(cfg)
    cache = KVCache.create(spec.num_layers, b, t + 4, spec.num_kv_heads,
                           spec.head_dim, dtype=jnp.float32)
    suppress = make_suppress_mask(cfg.vocab_size, 1024, (cfg.codec_eos_token_id,))
    state = talker_prefill(params, cfg, jnp.asarray(embeds.numpy()),
                           jnp.asarray(mask.numpy()), cache, jax.random.PRNGKey(0),
                           SamplingConfig(do_sample=False), suppress)
    # compare the last-position hidden-derived logits
    got = np.asarray(jnp.dot(state.past_hidden, params["codec_head"]))
    np.testing.assert_allclose(got, ref_logits[:, -1].numpy(), atol=2e-4)


def test_code_predictor_greedy_parity(ref_and_params):
    ref, cfg, params = ref_and_params
    b, h = 2, cfg.hidden_size
    torch.manual_seed(2)
    past_hidden = torch.randn(b, 1, h)
    last_embed = torch.randn(b, 1, h)

    with torch.no_grad():
        result = ref.code_predictor.generate(
            inputs_embeds=torch.cat([past_hidden, last_embed], dim=1),
            max_new_tokens=cfg.num_code_groups - 1,
            do_sample=False, top_p=1.0, top_k=0, temperature=1.0,
            return_dict_in_generate=True)
        ref_codes = result.sequences.numpy()

    codes, embed_sum = code_predictor_generate(
        params, cfg,
        jnp.asarray(past_hidden[:, 0].numpy()), jnp.asarray(last_embed[:, 0].numpy()),
        jax.random.PRNGKey(0), SamplingConfig(do_sample=False))
    np.testing.assert_array_equal(np.asarray(codes), ref_codes)

    # embed_sum must equal the sum of per-group embeddings
    want = np.zeros((b, h), np.float32)
    for i in range(cfg.num_code_groups - 1):
        want += np.asarray(params["code_predictor"]["codec_embeddings"])[i][ref_codes[:, i]]
    np.testing.assert_allclose(np.asarray(embed_sum), want, atol=1e-5)


@pytest.fixture(scope="module")
def full_ref_and_params():
    torch.manual_seed(0)
    cfg_d = tiny_talker_config_dict()
    full_cfg = Qwen3TTSConfig(
        talker_config=cfg_d, tts_model_type="custom_voice",
        im_start_token_id=1, im_end_token_id=2,
        tts_pad_token_id=100, tts_bos_token_id=101, tts_eos_token_id=102)
    ref = Qwen3TTSForConditionalGeneration(full_cfg).eval().float()
    tpu_cfg = TTSConfig.from_dict({
        "talker_config": cfg_d, "tts_model_type": "custom_voice",
        "im_start_token_id": 1, "im_end_token_id": 2,
        "tts_pad_token_id": 100, "tts_bos_token_id": 101, "tts_eos_token_id": 102})
    params = jax.tree.map(
        jnp.asarray,
        convert_talker({k: v.numpy() for k, v in ref.state_dict().items()},
                       tpu_cfg.talker, prefix="talker."))
    return ref, tpu_cfg, params


def _fake_input_ids(text_len: int, seed: int = 0):
    """Template ids: [role x3, text, im_end/newline/im_start/assistant/nl x5]."""
    rng = np.random.RandomState(seed)
    body = rng.randint(3, 90, size=(text_len,))
    return np.concatenate([[1, 5, 6], body, [2, 7, 1, 5, 6]]).astype(np.int64)


@pytest.mark.parametrize("non_streaming", [False, True])
def test_full_generate_greedy_parity(full_ref_and_params, non_streaming):
    ref, cfg, params = full_ref_and_params
    ids = [_fake_input_ids(4, 0), _fake_input_ids(7, 1)]
    languages = ["english", "auto"]
    speakers = ["vivian", None]

    with torch.no_grad():
        ref_codes, _ = ref.generate(
            input_ids=[torch.from_numpy(i).unsqueeze(0) for i in ids],
            languages=languages, speakers=speakers,
            non_streaming_mode=non_streaming,
            max_new_tokens=10, do_sample=False, subtalker_dosample=False,
            temperature=1.0, top_k=1, top_p=1.0, repetition_penalty=1.05,
            subtalker_temperature=1.0, subtalker_top_k=1, subtalker_top_p=1.0)
    ref_codes = [c.numpy() for c in ref_codes]

    prompt = assemble_prompts(params, cfg, ids, languages, speakers,
                              non_streaming_mode=non_streaming)
    result = generate_frames(
        params, cfg.talker, prompt.inputs_embeds, prompt.attention_mask,
        prompt.trailing_text_hidden, prompt.tts_pad_embed,
        jax.random.PRNGKey(0), max_frames=9,
        sampling=SamplingConfig(do_sample=False),
        subtalker_sampling=SamplingConfig(do_sample=False))
    got = trim_codes(result)

    assert len(got) == len(ref_codes)
    for g, r in zip(got, ref_codes):
        assert g.shape == r.shape, f"shape {g.shape} vs {r.shape}"
        np.testing.assert_array_equal(g, r)


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-q", "-x"]))


@pytest.mark.parametrize("non_streaming", [False, True])
def test_voice_clone_icl_greedy_parity(full_ref_and_params, non_streaming):
    """ICL voice-clone prompts (ref text + summed ref-code embeds) must yield
    identical greedy streams (reference generate_icl_prompt :1968-2019)."""
    ref, cfg, params = full_ref_and_params
    rng = np.random.RandomState(3)
    ids = [_fake_input_ids(5, 2)]
    # ref text template: role(3) + text + [im_end, nl] (2 tail)
    ref_ids_np = np.concatenate([[1, 5, 6], rng.randint(3, 90, size=(4,)),
                                 [2, 7]]).astype(np.int64)
    ref_code = rng.randint(0, 60, size=(6, cfg.talker.num_code_groups))

    vcp_torch = {
        "ref_code": [torch.from_numpy(ref_code)],
        "ref_spk_embedding": [torch.from_numpy(
            rng.randn(cfg.talker.hidden_size).astype(np.float32))],
        "x_vector_only_mode": [False],
        "icl_mode": [True],
    }
    with torch.no_grad():
        ref_codes, _ = ref.generate(
            input_ids=[torch.from_numpy(ids[0]).unsqueeze(0)],
            ref_ids=[torch.from_numpy(ref_ids_np).unsqueeze(0)],
            voice_clone_prompt=vcp_torch,
            languages=["auto"], non_streaming_mode=non_streaming,
            max_new_tokens=9, do_sample=False, subtalker_dosample=False,
            temperature=1.0, top_k=1, top_p=1.0, repetition_penalty=1.05,
            subtalker_temperature=1.0, subtalker_top_k=1, subtalker_top_p=1.0)
    want = [c.numpy() for c in ref_codes]

    vcp = {
        "ref_code": [ref_code],
        "ref_spk_embedding": [np.asarray(vcp_torch["ref_spk_embedding"][0])],
        "x_vector_only_mode": [False],
        "icl_mode": [True],
    }
    prompt = assemble_prompts(params, cfg, ids, ["auto"],
                              ref_ids=[ref_ids_np], voice_clone_prompt=vcp,
                              non_streaming_mode=non_streaming)
    result = generate_frames(
        params, cfg.talker, prompt.inputs_embeds, prompt.attention_mask,
        prompt.trailing_text_hidden, prompt.tts_pad_embed,
        jax.random.PRNGKey(0), max_frames=8,
        sampling=SamplingConfig(do_sample=False),
        subtalker_sampling=SamplingConfig(do_sample=False))
    got = trim_codes(result)
    assert got[0].shape == want[0].shape
    np.testing.assert_array_equal(got[0], want[0])


def test_instruct_prompt_greedy_parity(full_ref_and_params):
    """Instruction prefix (voice-design/custom-voice instruct) must yield
    identical greedy streams (reference :2076-2081)."""
    ref, cfg, params = full_ref_and_params
    rng = np.random.RandomState(9)
    ids = [_fake_input_ids(6, 4)]
    # "<|im_start|>user\n{instruct}<|im_end|>\n" arbitrary ids
    instruct = np.concatenate([[1, 8, 6], rng.randint(3, 90, size=(5,)),
                               [2, 7]]).astype(np.int64)

    with torch.no_grad():
        ref_codes, _ = ref.generate(
            input_ids=[torch.from_numpy(ids[0]).unsqueeze(0)],
            instruct_ids=[torch.from_numpy(instruct).unsqueeze(0)],
            languages=["english"], speakers=["vivian"],
            non_streaming_mode=True,
            max_new_tokens=8, do_sample=False, subtalker_dosample=False,
            temperature=1.0, top_k=1, top_p=1.0, repetition_penalty=1.05,
            subtalker_temperature=1.0, subtalker_top_k=1, subtalker_top_p=1.0)
    want = [c.numpy() for c in ref_codes]

    prompt = assemble_prompts(params, cfg, ids, ["english"], ["vivian"],
                              instruct_ids=[instruct], non_streaming_mode=True)
    result = generate_frames(
        params, cfg.talker, prompt.inputs_embeds, prompt.attention_mask,
        prompt.trailing_text_hidden, prompt.tts_pad_embed,
        jax.random.PRNGKey(0), max_frames=7,
        sampling=SamplingConfig(do_sample=False),
        subtalker_sampling=SamplingConfig(do_sample=False))
    got = trim_codes(result)
    assert got[0].shape == want[0].shape
    np.testing.assert_array_equal(got[0], want[0])
