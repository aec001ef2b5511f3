"""HTTP serving layer (inference/serving.py): dynamic batching, text and audio
requests, error handling — driven over a real socket with a tiny model."""

import base64
import io
import json
import threading
import urllib.request
import wave

import numpy as np
import pytest

import jax

from seamless_communication_tpu.inference.serving import serve
from seamless_communication_tpu.inference.translator import Translator
from seamless_communication_tpu.models.unity import model as unity
from seamless_communication_tpu.models.unity.builder import get_arch
from seamless_communication_tpu.models.unity.unit_tokenizer import UnitTokenizer
from seamless_communication_tpu.text.char_tokenizer import CharTokenizer
from seamless_communication_tpu.text.nllb import NllbTokenizer
from seamless_communication_tpu.text.spm import (
    SentencePieceModel, build_spm_model, TYPE_CONTROL, TYPE_NORMAL, TYPE_UNKNOWN,
)


def _wav_b64(wav: np.ndarray) -> str:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes((np.clip(wav, -1, 1) * 32767).astype("<i2").tobytes())
    return base64.b64encode(buf.getvalue()).decode()


def _post(port: int, obj: dict):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/translate",
        data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=300) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture(scope="module")
def server():
    cfg = get_arch("tiny_v2")
    params = unity.unity_init(jax.random.PRNGKey(0), cfg)
    base = [("<unk>", 0.0, TYPE_UNKNOWN), ("<s>", 0.0, TYPE_CONTROL),
            ("</s>", 0.0, TYPE_CONTROL)]
    words = ["▁aa", "▁bb", "▁cc"]
    chars = ["▁"] + list("abc")
    text_tok = NllbTokenizer(SentencePieceModel.from_bytes(build_spm_model(
        base + [(w, -2.0, TYPE_NORMAL) for w in words]
        + [(c, -10.0, TYPE_NORMAL) for c in chars])),
        langs=["__eng__", "__fra__"])
    char_tok = CharTokenizer(SentencePieceModel.from_bytes(build_spm_model(
        base + [(c, -1.0, TYPE_NORMAL) for c in chars])))
    unit_tok = UnitTokenizer(100, ["eng", "fra"], "base_v2")
    translator = Translator(params, cfg, text_tok, unit_tok, char_tok)
    srv = serve(translator, port=0, max_batch=4, max_wait_ms=50)
    yield srv.server_address[1]
    srv.shutdown()
    srv.batcher.close()


def test_healthz(server):
    with urllib.request.urlopen(f"http://127.0.0.1:{server}/healthz",
                                timeout=30) as resp:
        assert resp.status == 200
        assert json.loads(resp.read())["status"] == "ok"


def test_concurrent_mixed_requests(server):
    wav = (0.1 * np.sin(2 * np.pi * 300 * np.arange(16000) / 16000)
           ).astype(np.float32)
    reqs = ([{"task": "s2tt", "tgt_lang": "eng", "audio_b64": _wav_b64(wav)}] * 3
            + [{"task": "t2tt", "tgt_lang": "fra", "src_lang": "eng",
                "text": "aa bb"}] * 2)
    results = [None] * len(reqs)

    def work(i):
        results[i] = _post(server, reqs[i])

    threads = [threading.Thread(target=work, args=(i,))
               for i in range(len(reqs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for code, body in results:
        assert code == 200, body
        assert "text" in body


def test_bad_requests(server):
    code, body = _post(server, {"task": "s2tt"})           # missing tgt_lang
    assert code == 400 and "error" in body
    code, body = _post(server, {"task": "t2tt", "tgt_lang": "fra",
                                "text": "aa"})             # no src_lang
    assert code == 400 and "src_lang" in body["error"]
    code, body = _post(server, {"task": "s2tt", "tgt_lang": "eng",
                                "audio_b64": "not-base64!!"})
    assert code == 400
    code, body = _post(server, {"task": "nope", "tgt_lang": "eng",
                                "audio_b64": _wav_b64(np.zeros(4000,
                                                               np.float32))})
    assert code == 500 and "unknown task" in body["error"]
