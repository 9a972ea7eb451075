"""LLaVA multimodal path: CLIP tower parity vs HF transformers (random
weights, layer -2 features + projector — the reference validates clip.cpp
only by example runs; we require numeric parity), mmproj GGUF round-trip,
preprocessing behavior, and the embedding-input decode path end-to-end."""

import numpy as np
import pytest

import jax.numpy as jnp

from pipeinfer_tpu.models import clip as clip_mod
from pipeinfer_tpu.models import load_model
from pipeinfer_tpu.runtime.context import Batch, InferenceContext
from pipeinfer_tpu.tools import testmodel
from pipeinfer_tpu.tools.convert_clip import write_mmproj

N_EMBD_LM = 64


@pytest.fixture(scope="module")
def hf_vision():
    import torch
    from transformers import CLIPVisionConfig, CLIPVisionModel

    torch.manual_seed(0)
    cfg = CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, image_size=32, patch_size=8,
        hidden_act="quick_gelu", projection_dim=32,
    )
    model = CLIPVisionModel(cfg).eval()
    return model, cfg


@pytest.fixture(scope="module")
def mmproj(hf_vision, tmp_path_factory):
    import torch

    model, cfg = hf_vision
    torch.manual_seed(1)
    mm0_w = torch.randn(N_EMBD_LM, cfg.hidden_size) * 0.1
    mm0_b = torch.randn(N_EMBD_LM) * 0.1
    mm2_w = torch.randn(N_EMBD_LM, N_EMBD_LM) * 0.1
    mm2_b = torch.randn(N_EMBD_LM) * 0.1
    path = tmp_path_factory.mktemp("mmproj") / "mmproj.gguf"
    state = {k: v.detach().numpy() for k, v in model.vision_model.state_dict().items()}
    write_mmproj(
        path, cfg=cfg, state=state,
        mm0_w=mm0_w.numpy(), mm0_b=mm0_b.numpy(),
        mm2_w=mm2_w.numpy(), mm2_b=mm2_b.numpy(),
    )
    return path, (mm0_w, mm0_b, mm2_w, mm2_b)


def test_clip_encoder_matches_hf(hf_vision, mmproj):
    """Our jitted CLIP tower must match HF hidden_states[-2] (the LLaVA
    vision feature layer) + projector on the same pixels."""
    import torch

    model, cfg = hf_vision
    path, (mm0_w, mm0_b, mm2_w, mm2_b) = mmproj
    params, ccfg = clip_mod.load_mmproj(path)
    assert ccfg.n_patches == 16 and not ccfg.use_gelu

    rng = np.random.default_rng(3)
    pixels = rng.standard_normal((cfg.image_size, cfg.image_size, 3)).astype(np.float32)

    got = clip_mod.encode_image(params, ccfg, pixels)

    with torch.no_grad():
        pt = torch.from_numpy(pixels.transpose(2, 0, 1))[None]
        hs = model(pt, output_hidden_states=True).hidden_states
        feat = hs[-2][0, 1:, :]  # layer -2, class token dropped
        want = torch.nn.functional.gelu(feat @ mm0_w.T + mm0_b) @ mm2_w.T + mm2_b

    assert got.shape == (ccfg.n_patches, N_EMBD_LM)
    err = np.abs(got - want.numpy()).max()
    assert err < 2e-4, f"CLIP tower diverges from HF: max err {err}"


def test_preprocess_pads_and_normalizes(mmproj):
    from PIL import Image

    path, _ = mmproj
    _, ccfg = clip_mod.load_mmproj(path)
    img = Image.new("RGB", (20, 10), (255, 0, 0))  # non-square
    x = clip_mod.preprocess_image(img, ccfg)
    assert x.shape == (ccfg.image_size, ccfg.image_size, 3)
    # top rows red-ish, bottom rows llava background color
    bg = (np.array([122, 116, 104]) / 255.0 - np.array(ccfg.image_mean)) / np.array(ccfg.image_std)
    np.testing.assert_allclose(x[-1, 0], bg, atol=0.15)


def test_decode_embd_matches_token_path(tmp_path):
    """Feeding tok_embd rows through decode_embd must reproduce the token
    decode path exactly (same KV cells, same logits)."""
    path = tmp_path / "m.gguf"
    testmodel.build_tiny_llama(path, seed=2, n_layers=2, n_embd=N_EMBD_LM,
                               n_heads=4, n_kv_heads=2, n_ff=128)
    params, cfg = load_model(path)
    toks = [5, 9, 23, 7]

    ctx_a = InferenceContext(params, cfg, n_cells=64, cache_dtype=jnp.float32)
    b = Batch()
    for i, t in enumerate(toks):
        b.add(t, i, 0, want_logits=(i == len(toks) - 1))
    want = ctx_a.decode(b)[-1]

    ctx_b = InferenceContext(params, cfg, n_cells=64, cache_dtype=jnp.float32)
    embd = np.asarray(params["tok_embd"], np.float32)[toks]
    got = ctx_b.decode_embd(embd, 0)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # and generation continues coherently off the embd-primed cache
    b.clear()
    b.add(int(np.argmax(got)), len(toks), 0)
    l2 = ctx_b.decode(b)[0]
    b.clear()
    b.add(int(np.argmax(want)), len(toks), 0)
    l1 = ctx_a.decode(b)[0]
    np.testing.assert_allclose(l2, l1, rtol=1e-5, atol=1e-5)


def test_llava_image_conditions_generation(mmproj, tmp_path):
    """End-to-end: different images → different continuations; same image
    twice → identical (deterministic conditioning through the projector)."""
    path, _ = mmproj
    cparams, ccfg = clip_mod.load_mmproj(path)
    mpath = tmp_path / "m.gguf"
    testmodel.build_tiny_llama(mpath, seed=2, n_layers=2, n_embd=N_EMBD_LM,
                               n_heads=4, n_kv_heads=2, n_ff=128)
    params, cfg = load_model(mpath)

    def run(pixel_seed):
        rng = np.random.default_rng(pixel_seed)
        img = rng.integers(0, 255, (ccfg.image_size, ccfg.image_size, 3), np.uint8)
        pixels = clip_mod.preprocess_image(img, ccfg)
        embd = clip_mod.encode_image(cparams, ccfg, pixels)
        ctx = InferenceContext(params, cfg, n_cells=128, cache_dtype=jnp.float32)
        b = Batch()
        pre = [1, 7, 12]
        for i, t in enumerate(pre):
            b.add(t, i, 0)
        ctx.decode(b)
        logits = ctx.decode_embd(embd, len(pre))
        out = []
        pos = len(pre) + embd.shape[0]
        for _ in range(8):
            t = int(np.argmax(logits))
            out.append(t)
            b.clear()
            b.add(t, pos, 0)
            logits = ctx.decode(b)[0]
            pos += 1
        return out

    a1, a2, c = run(1), run(1), run(99)
    assert a1 == a2, "same image must give identical greedy output"
    assert a1 != c, "different images should condition generation differently"


def test_llava_server_image_requests(mmproj, tmp_path):
    """Multimodal serving: /completion with base64 image_data + [img-0]
    placeholder (ref: server.cpp slot_image); deterministic per image,
    different across images, clean 400 without --mmproj."""
    import base64
    import io
    import json
    import threading
    import urllib.request

    from PIL import Image

    from pipeinfer_tpu.serving.server import serve

    path, _ = mmproj
    mpath = tmp_path / "m.gguf"
    testmodel.build_tiny_llama(
        mpath, seed=2, vocab_from="/root/reference/models/ggml-vocab-llama.gguf",
        n_layers=2, n_embd=N_EMBD_LM, n_heads=4, n_kv_heads=2, n_ff=128,
    )
    httpd, engine = serve(str(mpath), "127.0.0.1", 0, n_cells=512, max_slots=2,
                          mmproj_path=str(path))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()

    def b64_img(color):
        img = Image.new("RGB", (32, 32), color)
        buf = io.BytesIO()
        img.save(buf, "PNG")
        return base64.b64encode(buf.getvalue()).decode()

    def post(body):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/completion", data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            return json.load(r)

    try:
        body = {"prompt": "USER:[img-0]\ndescribe\nASSISTANT:", "n_predict": 6,
                "temperature": 0,
                "image_data": [{"data": b64_img((250, 10, 10)), "id": 0}]}
        r1 = post(body)
        r2 = post(body)
        assert r1["tokens_predicted"] >= 1
        assert r1["content"] == r2["content"], "same image must be deterministic"

        body["image_data"] = [{"data": b64_img((10, 10, 250)), "id": 0}]
        r3 = post(body)
        assert r3["content"] != r1["content"], "image did not condition output"

        # missing id referenced in prompt
        bad = dict(body, prompt="[img-7]x", n_predict=2)
        import urllib.error

        try:
            post(bad)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        httpd.shutdown()
        engine.shutdown()
