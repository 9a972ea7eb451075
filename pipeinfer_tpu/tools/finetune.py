"""`python -m pipeinfer_tpu.tools.finetune` — full fine-tune or
train-from-scratch for the llama family
(ref: examples/finetune + examples/train-text-from-scratch + the
checkpoint machinery in common/train.cpp):

- loads a GGUF model as f32 master weights (quantized weights are
  dequantized; use --init-random with size flags to train from scratch);
- AdamW (optax) on the causal-LM loss over a tokenized text corpus, with
  per-layer rematerialization;
- periodic checkpoints: model back to GGUF (resumable by every other tool)
  plus optimizer state in an .npz sidecar.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np


def dense_params(params):
    """QuantTensor -> dense f32 arrays (training needs real gradients)."""
    import jax.numpy as jnp

    from ..ops.qmatmul import QuantTensor, dequant

    def conv(w):
        if isinstance(w, QuantTensor):
            return dequant(w, jnp.float32)
        return jnp.asarray(w, jnp.float32)

    out = {k: conv(v) for k, v in params.items() if k != "layers"}
    out["layers"] = [{k: conv(v) for k, v in lp.items()} for lp in params["layers"]]
    return out


def save_gguf(params, cfg, path):
    from ..tools.testmodel import write_llama_gguf

    w = {
        "tok_embd": np.asarray(params["tok_embd"], np.float32),
        "output_norm": np.asarray(params["output_norm"], np.float32),
        "output": np.asarray(params["output"], np.float32),
    }
    for i, lp in enumerate(params["layers"]):
        for slot, arr in lp.items():
            w[f"layers.{i}.{slot}"] = np.asarray(arr, np.float32)
    write_llama_gguf(
        path, w,
        n_layers=cfg.n_layers, n_embd=cfg.n_embd, n_heads=cfg.n_heads,
        n_kv_heads=cfg.n_kv_heads, n_ff=cfg.n_ff, n_vocab=cfg.n_vocab,
        rope_base=cfg.rope_base, norm_eps=cfg.norm_eps, n_ctx=cfg.n_ctx_train,
    )


def save_opt_state(opt_state, step: int, path: str):
    """Optimizer-state checkpoint (ref: common/train.cpp opt context
    serialization — AdamW moments + step counter). Leaves are saved in
    tree-flatten order; the structure is reproducible from opt.init."""
    import jax

    leaves = jax.tree_util.tree_leaves(opt_state)
    np.savez(
        path, step=np.int64(step),
        **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)},
    )


def load_opt_state(path: str, opt_state_template):
    """Restore an optimizer state saved by save_opt_state into the
    structure of `opt_state_template` (from opt.init on matching params)."""
    import jax

    data = np.load(path)
    treedef = jax.tree_util.tree_structure(opt_state_template)
    n = treedef.num_leaves
    leaves = [data[f"leaf_{i}"] for i in range(n)]
    return jax.tree_util.tree_unflatten(treedef, leaves), int(data["step"])


def train(
    params,
    cfg,
    token_stream: np.ndarray,
    *,
    seq_len: int = 128,
    batch: int = 4,
    steps: int = 100,
    lr: float = 1e-4,
    ckpt_every: int = 0,
    ckpt_path: str = "",
    log=print,
    seed: int = 0,
    resume_opt: str = "",
):
    import jax
    import jax.numpy as jnp
    import optax

    from ..models.train import lm_loss

    opt = optax.adamw(lr)
    opt_state = opt.init(params)
    start_step = 0
    if resume_opt:
        opt_state, last_step = load_opt_state(resume_opt, opt_state)
        start_step = last_step + 1
        log(f"resumed optimizer state at step {start_step}")
    loss_grad = jax.jit(jax.value_and_grad(lambda p, toks: lm_loss(p, cfg, toks)))

    @jax.jit
    def update(params, opt_state, toks):
        loss, grads = jax.value_and_grad(lambda p: lm_loss(p, cfg, toks))(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    del loss_grad
    n_chunks = len(token_stream) - seq_len - 1
    losses = []
    t0 = time.time()
    for step in range(start_step, steps):
        # per-step rng: the batch at step k is identical whether or not the
        # run was resumed mid-stream (bit-reproducible resume)
        rng = np.random.default_rng((seed, step))
        starts = rng.integers(0, n_chunks, batch)
        toks = np.stack([token_stream[s : s + seq_len + 1] for s in starts])
        params, opt_state, loss = update(params, opt_state, jnp.asarray(toks))
        losses.append(float(loss))
        if step % 10 == 0 or step == steps - 1:
            log(f"step {step}: loss {float(loss):.4f} ({time.time()-t0:.1f}s)")
        if ckpt_every and ckpt_path and (step + 1) % ckpt_every == 0:
            save_gguf(params, cfg, ckpt_path)
            save_opt_state(opt_state, step, str(ckpt_path) + ".opt.npz")
            log(f"checkpoint -> {ckpt_path} (+.opt.npz)")
    return params, losses


def main(argv=None):
    p = argparse.ArgumentParser("pipeinfer-finetune", description=__doc__)
    p.add_argument("-m", "--model", help="base GGUF model (omit with --init-random)")
    p.add_argument("-f", "--file", required=True, help="training text")
    p.add_argument("-o", "--out", required=True, help="output GGUF")
    p.add_argument("--init-random", action="store_true", help="train from scratch")
    p.add_argument("--vocab-from", default="", help="vocab gguf for --init-random")
    p.add_argument("--n-layers", type=int, default=4)
    p.add_argument("--n-embd", type=int, default=256)
    p.add_argument("--n-heads", type=int, default=8)
    p.add_argument("--n-ff", type=int, default=512)
    p.add_argument("--seq-len", type=int, default=128)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--ckpt-every", type=int, default=0)
    p.add_argument("--resume", default="",
                   help="checkpoint GGUF to resume from (model + .opt.npz)")
    args = p.parse_args(argv)

    from ..gguf.reader import GGUFReader
    from ..models import load_model
    from ..tokenizer import tokenizer_from_gguf

    if args.resume:
        args.model = args.resume
    if args.init_random:
        from ..tools import testmodel

        vocab_src = args.vocab_from or args.model
        if not vocab_src:
            raise SystemExit("--init-random needs --vocab-from or -m for the vocabulary")
        import tempfile

        tmp = Path(tempfile.mkdtemp()) / "init.gguf"
        testmodel.build_tiny_llama(
            tmp, n_layers=args.n_layers, n_embd=args.n_embd, n_heads=args.n_heads,
            n_kv_heads=args.n_heads, n_ff=args.n_ff, vocab_from=vocab_src,
        )
        model_path = tmp
    else:
        model_path = args.model
    params, cfg = load_model(model_path, fuse=False)  # training reads split slots
    with GGUFReader(model_path) as r:
        tok = tokenizer_from_gguf(r)

    text = open(args.file).read()
    stream = np.asarray(tok.encode(text, add_bos=True), np.int32)
    if len(stream) < args.seq_len + 2:
        raise SystemExit(f"corpus too short: {len(stream)} tokens")
    params = dense_params(params)
    params, losses = train(
        params, cfg, stream,
        seq_len=args.seq_len, batch=args.batch, steps=args.steps, lr=args.lr,
        ckpt_every=args.ckpt_every, ckpt_path=args.out,
        log=lambda s: print(s, file=sys.stderr),
        resume_opt=(args.resume + ".opt.npz") if args.resume else "",
    )
    save_gguf(params, cfg, args.out)
    print(f"final loss {losses[-1]:.4f} -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
