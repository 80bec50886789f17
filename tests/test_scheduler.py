"""Continuous batching scheduler tests on the tiny checkpoint."""

import numpy as np
import pytest
import jax.numpy as jnp

from _checkpoint import StubProcessor, build_checkpoint


@pytest.fixture(scope="module")
def batcher(tmp_path_factory):
    from qwen3_tts_tpu.inference.tts_model import Qwen3TTSModel
    from qwen3_tts_tpu.serving.scheduler import ContinuousBatcher
    from qwen3_tts_tpu.nn.sampling import SamplingConfig

    d = build_checkpoint(str(tmp_path_factory.mktemp("cb")), "custom_voice")
    m = Qwen3TTSModel.from_pretrained(d, dtype=jnp.float32, load_processor=False)
    m.processor = StubProcessor()
    b = ContinuousBatcher(m, capacity=3, cache_len=128, burst_frames=3,
                          sampling=SamplingConfig(do_sample=True, top_k=10),
                          sub_sampling=SamplingConfig(do_sample=True, top_k=10))
    yield b
    b.shutdown()


def test_single_request(batcher):
    fut = batcher.submit("hello world", speaker="vivian", language="english",
                         max_frames=6)
    wav, sr = fut.result(timeout=300)
    assert sr == 24000 and wav.ndim == 1


def test_concurrent_requests_batched(batcher):
    futs = [batcher.submit(f"request number {i}", speaker="vivian",
                           language="english", max_frames=5 + i)
            for i in range(5)]  # > capacity: forces queueing + slot reuse
    results = [f.result(timeout=600) for f in futs]
    assert len(results) == 5
    for wav, sr in results:
        assert sr == 24000 and wav.ndim == 1


def test_batch_then_drain_then_new(batcher):
    f1 = batcher.submit("first", speaker="vivian", max_frames=4)
    f1.result(timeout=300)
    # after drain the state resets; a new request must still work
    f2 = batcher.submit("after the drain", speaker="vivian", max_frames=4)
    wav, sr = f2.result(timeout=300)
    assert wav.ndim == 1


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-q", "-x"]))


def test_server_with_continuous_batching(tmp_path_factory):
    import json
    import threading
    import urllib.request

    from qwen3_tts_tpu.inference.tts_model import Qwen3TTSModel
    from qwen3_tts_tpu.serving.server import serve

    d = build_checkpoint(str(tmp_path_factory.mktemp("cbsrv")), "custom_voice")
    m = Qwen3TTSModel.from_pretrained(d, dtype=jnp.float32, load_processor=False)
    m.processor = StubProcessor()
    httpd, app = serve(m, host="127.0.0.1", port=18754, block=False,
                       continuous_batching=True, batch_capacity=2)
    th = threading.Thread(target=httpd.serve_forever, daemon=True)
    th.start()
    try:
        req = urllib.request.Request(
            "http://127.0.0.1:18754/synthesize",
            data=json.dumps({"text": "batched request", "speaker": "vivian",
                             "language": "english", "max_new_tokens": 6}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as r:
            out = json.loads(r.read())
        assert out["metrics"]["batched"] is True
        assert out["sample_rate"] == 24000
    finally:
        httpd.shutdown()
        app.batcher.shutdown()


def test_bucketed_admission_mixed_lengths(batcher):
    """Prompts landing in different buckets batch together; an over-long
    prompt is rejected cleanly instead of wedging the batch."""
    import concurrent.futures

    # streaming-layout prompts are tiny; an instruct prefix grows the prompt
    # into a bigger admission bucket
    short = batcher.submit("hi", speaker="vivian", max_frames=4)
    medium = batcher.submit("text", speaker="vivian", max_frames=4,
                            instruct="speak slowly " * 5)
    for fut in (short, medium):
        wav, sr = fut.result(timeout=300)
        assert wav.ndim == 1
    assert len(batcher._join_fns) >= 2  # at least two bucket programs

    too_long = batcher.submit("hi", speaker="vivian", max_frames=4,
                              instruct="x" * 400)
    with pytest.raises(ValueError, match="does not fit"):
        too_long.result(timeout=120)
