"""Optional real-backend detection (baram_ray/backends.py): probes must
return None and change NOTHING in this container (no PIL / torch /
sentence-transformers wheels), route the real path when a backend IS
present (wheel-gated tests, skipped here; the LLM HTTP arm is tested
for real against a localhost server — sockets need no external
network), and stay pickle-safe across the task boundary."""

import json
import pickle
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from baram_ray import backends


def _has(mod):
    return backends.have(mod)


# --------------------------------------------------------------------------
# Absent-backend behavior: probes say None, stages keep the honest error.


@pytest.mark.skipif(_has("sentence_transformers"),
                    reason="wheel present: real path active")
def test_st_probe_none_and_embed_stage_still_raises():
    assert backends.st_encode_fn() is None
    from baram_ray.stages.embed import EmbedStage
    with pytest.raises(NotImplementedError):
        EmbedStage(real_model=True)


@pytest.mark.skipif(_has("PIL"), reason="wheel present: real path active")
def test_pil_probe_none_and_decode_stage_still_raises():
    assert backends.pil_decode_fn() is None
    assert backends.pil_feature_fn() is None
    if not _has("av"):
        assert backends.media_decode_fn() is None
    from baram_ray.multimodal import DecodeStage
    st = DecodeStage(real_decode=True)
    with pytest.raises(NotImplementedError):
        st._decode_one("image", b"\xff\xd8\xff\xe0 not a real jpeg")


def test_llm_probe_none_without_env(monkeypatch):
    for var in ("OLLAMA_URL", "VLLM_URL", "LLM_ENDPOINT", "LLM_BACKEND"):
        monkeypatch.delenv(var, raising=False)
    assert backends.llm_generate_fn() is None
    from baram_ray.llm import LlmClient
    with pytest.raises(NotImplementedError):
        LlmClient().generate("hi")


def test_fake_paths_unchanged_by_detection():
    """The deterministic fakes must be byte-identical with detection
    wired in (no real backend present)."""
    from baram_ray.stages.embed import EmbedStage
    st = EmbedStage()
    v1, v2 = st._encode_one("hello world"), st._encode_one("hello world")
    assert (v1 == v2).all()


# --------------------------------------------------------------------------
# Live-endpoint arm, tested for REAL against a localhost HTTP server.


class _FakeLlmHandler(BaseHTTPRequestHandler):
    def do_POST(self):
        body = json.loads(
            self.rfile.read(int(self.headers["Content-Length"])))
        if self.path == "/api/generate":          # Ollama arm
            out = {"model": body["model"],
                   "response": f"ollama:{body['prompt'][:20]}",
                   "done": True}
        elif self.path == "/v1/chat/completions":  # OpenAI/vLLM arm
            content = body["messages"][0]["content"]
            out = {"choices": [{"message": {
                "role": "assistant",
                "content": f"vllm:{content[:20]}"}}]}
        else:
            self.send_response(404)
            self.end_headers()
            return
        data = json.dumps(out).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *a):  # silence
        pass


@pytest.fixture()
def llm_server():
    srv = HTTPServer(("127.0.0.1", 0), _FakeLlmHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_ollama_arm_end_to_end(llm_server, monkeypatch):
    monkeypatch.setenv("OLLAMA_URL", llm_server)
    monkeypatch.delenv("VLLM_URL", raising=False)
    fn = backends.llm_generate_fn()
    assert fn is not None
    assert fn("tell me a story") == "ollama:tell me a story"

    # through LlmClient auto-detection (the llm.py:174 slot)
    from baram_ray.llm import LlmClient
    assert LlmClient().generate("hello") == "ollama:hello"


def test_vllm_arm_end_to_end(llm_server, monkeypatch):
    monkeypatch.delenv("OLLAMA_URL", raising=False)
    monkeypatch.setenv("VLLM_URL", llm_server)
    fn = backends.llm_generate_fn()
    assert fn is not None
    assert fn("summarize this") == "vllm:summarize this"

    # through summarize.RealLlmClient (summary.rs:137-182 parity slot)
    from baram_ray.summarize import RealLlmClient, SummarizeStage
    client = RealLlmClient()
    assert client.generate("x") == "vllm:x"
    st = SummarizeStage(real_llm=True)
    assert st.client.generate("y") == "vllm:y"


def test_vllm_via_llm_backend_env(llm_server, monkeypatch):
    monkeypatch.delenv("OLLAMA_URL", raising=False)
    monkeypatch.delenv("VLLM_URL", raising=False)
    monkeypatch.setenv("LLM_BACKEND", "vllm")
    monkeypatch.setenv("LLM_ENDPOINT", llm_server)
    fn = backends.llm_generate_fn()
    assert fn is not None and fn("q") == "vllm:q"


def test_generate_fns_pickle_safe(monkeypatch):
    """Backend callables cross task boundaries into actor __init__ —
    they must pickle without dragging a live connection/model along."""
    monkeypatch.setenv("OLLAMA_URL", "http://127.0.0.1:1")
    fn = backends.llm_generate_fn()
    fn2 = pickle.loads(pickle.dumps(fn))
    assert fn2.endpoint == fn.endpoint


# --------------------------------------------------------------------------
# Wheel-gated real-path tests (run only where the wheel exists).


def test_pil_decode_real_path():
    pytest.importorskip("PIL")
    import io

    from PIL import Image
    buf = io.BytesIO()
    Image.new("RGB", (32, 17), (255, 0, 0)).save(buf, format="PNG")
    payload = buf.getvalue()

    fn = backends.media_decode_fn()
    out = fn("image", payload)
    assert (out["decoded_width"], out["decoded_height"]) == (32, 17)
    assert out["ok"] and out["n_frames"] == 1

    from baram_ray.multimodal import DecodeStage
    st = DecodeStage(real_decode=True)
    got = st._decode_one("image", payload)
    assert (got["decoded_width"], got["decoded_height"]) == (32, 17)

    feats = backends.pil_feature_fn(64)([payload])
    assert feats.shape == (1, 64)


def test_sentence_transformers_real_path():
    pytest.importorskip("sentence_transformers")
    enc = backends.st_encode_fn(384)
    out = enc(["hello world", "two sentences"])
    assert out.shape == (2, 384)

    from baram_ray.stages.embed import EmbedStage
    st = EmbedStage(real_model=True)
    assert st._encode_fn is not None


def test_encoder_shell_pickles_without_model():
    enc = backends._SentenceTransformerEncoder("some/model", 384)
    enc._model = object()   # stand-in for a loaded, unpicklable model
    enc2 = pickle.loads(pickle.dumps(enc))
    assert enc2._model is None and enc2.model_name == "some/model"
