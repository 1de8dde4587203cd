"""Neural LM trainer.

Counterpart of /root/reference/cat/lm/train.py: LMTrainer (:51-75 — CE
over flattened tokens via gather.cat) and ppl-as-metric eval (:79-87).
Here the flattening trick is unnecessary: CE is computed densely with a
length mask (XLA fuses it); eval reports summed token NLL so the Manager
metric is ln-ppl per token.

Model: any decoder from the zoo with a head (LSTMPredictor with_head,
CausalTransformer, Embedding). Convention: id 0 = <s> is both BOS and
EOS (the toolkit's blank/bos unification).
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
import optax

from cat_tpu import models
from cat_tpu.utils.manager import TrainState


def build_model(cfg: dict, num_classes: int):
    dec_cfg = cfg["decoder"]
    kw = dict(dec_cfg.get("kwargs", {}))
    kw.setdefault("vocab_size", num_classes)
    kw["num_classes"] = num_classes
    kw["with_head"] = True
    return models.get_decoder(dec_cfg["type"])(**kw)


def init_state(model, tx, rng=None) -> TrainState:
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    tokens = jnp.zeros((2, 8), jnp.int32)
    lens = jnp.asarray([8, 8], jnp.int32)
    variables = jax.jit(partial(model.init, deterministic=True))(
        rng, tokens, lens)
    return TrainState(params=variables["params"],
                      batch_stats=variables.get("batch_stats", {}),
                      opt_state=tx.init(variables["params"]),
                      step=jnp.asarray(0))


class LmLoader:
    """Bucketed batches over a CorpusDataset: (N, U) token ids with
    lengths; inputs get <s> prepended, targets get <s> appended
    (eos scoring)."""

    def __init__(self, dataset, token_budget=8000, num_buckets=4,
                 max_len=512, shuffle=True, seed=0):
        from cat_tpu.utils.data import make_buckets

        self.ds = dataset
        n = len(dataset)
        self.lens = np.asarray([min(dataset.token_length(i) + 1, max_len)
                                for i in range(n)])
        self.indices = np.arange(n)
        self.buckets = make_buckets(self.lens, num_buckets, min_len=8)
        self.batch_sizes = [max(token_budget // e, 1)
                            for e in self.buckets]
        self.shuffle = shuffle
        self.seed = seed
        self.max_len = max_len

    def bucket_of(self, L):
        for b, e in enumerate(self.buckets):
            if L <= e:
                return b
        return len(self.buckets) - 1

    def _collate(self, idxs, b):
        B, U = len(idxs), self.buckets[b]
        inputs = np.zeros((B, U), np.int32)
        targets = np.zeros((B, U), np.int32)
        lens = np.zeros((B,), np.int32)
        for j, i in enumerate(idxs):
            ids = np.asarray(self.ds[i])[: U - 1]
            L = len(ids) + 1
            inputs[j, 1: L] = ids          # [<s>, w1..wn]
            targets[j, : L - 1] = ids      # [w1..wn, </s>=0]
            targets[j, L - 1] = 0
            lens[j] = L
        return dict(tokens=inputs, targets=targets, lengths=lens,
                    weight=np.ones((B,), np.float32))

    def epoch(self, epoch_idx):
        rng = np.random.default_rng(self.seed + epoch_idx)
        order = self.indices.copy()
        if self.shuffle:
            rng.shuffle(order)
        pools = [[] for _ in self.buckets]
        for i in order:
            b = self.bucket_of(self.lens[i])
            pools[b].append(i)
            if len(pools[b]) == self.batch_sizes[b]:
                yield self._collate(pools[b], b)
                pools[b] = []
        for b, pool in enumerate(pools):
            if pool:
                yield self._collate(pool, b)

    def __iter__(self):
        return self.epoch(0)


def make_loss_fn(model):
    def loss_fn(params, batch_stats, batch, rng, train):
        tokens = batch["tokens"]
        lens = batch["lengths"]
        out = model.apply(
            {"params": params}, tokens, lens, deterministic=not train,
            rngs={"dropout": rng} if train else {})
        logits, _ = out
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tgt = batch["targets"]
        nll_tok = -jnp.take_along_axis(lp, tgt[..., None],
                                       axis=-1)[..., 0]  # (N, U)
        mask = jnp.arange(tokens.shape[1])[None, :] < lens[:, None]
        nll_tok = jnp.where(mask, nll_tok, 0.0)
        per_seq = jnp.sum(nll_tok, axis=1)
        tokens_count = jnp.sum(mask)
        loss = jnp.sum(per_seq) / jnp.maximum(tokens_count, 1)
        return loss, (batch_stats, per_seq, tokens_count)

    return loss_fn


def make_train_step(model, tx, grad_clip=5.0):
    from cat_tpu.ctc.train import set_lr

    loss_fn = make_loss_fn(model)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, lr, rng):
        (loss, (stats, _, _)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats,
                                   batch, rng, True)
        gnorm = optax.global_norm(grads)
        if grad_clip > 0:
            scale = jnp.minimum(1.0, grad_clip / (gnorm + 1e-6))
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        opt_state = set_lr(state.opt_state, lr)
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (state.replace(params=params, opt_state=opt_state,
                              step=state.step + 1),
                {"loss": loss, "grad_norm": gnorm})

    return train_step


def make_eval_step(model):
    loss_fn = make_loss_fn(model)

    @jax.jit
    def eval_step(state: TrainState, batch):
        _, (_, per_seq, tok_count) = loss_fn(
            state.params, state.batch_stats, batch,
            jax.random.PRNGKey(0), False)
        # loss metric = ln-ppl per token (sum nll / token count)
        return {"loss_sum": jnp.sum(per_seq), "count": tok_count}

    return eval_step


def sentence_nll(model, params, id_sequences, batch_size=16,
                 max_len=512):
    """Per-sentence NLL (nats) for rescoring/ppl — batched + jitted."""
    from cat_tpu.utils.data import pack_corpus, CorpusDataset
    import tempfile

    @jax.jit
    def score(tokens, targets, lens):
        logits, _ = model.apply({"params": params}, tokens, lens,
                                deterministic=True)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll_tok = -jnp.take_along_axis(lp, targets[..., None],
                                       axis=-1)[..., 0]
        mask = jnp.arange(tokens.shape[1])[None, :] < lens[:, None]
        return jnp.sum(jnp.where(mask, nll_tok, 0.0), axis=1)

    # bucket to a couple of shapes to bound compilations
    results = np.zeros(len(id_sequences), np.float64)
    order = np.argsort([len(s) for s in id_sequences])
    for start in range(0, len(order), batch_size):
        idxs = order[start:start + batch_size]
        U = max(2, max(len(id_sequences[i]) for i in idxs) + 1)
        U = min(int(2 ** np.ceil(np.log2(U))), max_len)
        B = len(idxs)
        tokens = np.zeros((B, U), np.int32)
        targets = np.zeros((B, U), np.int32)
        lens = np.zeros((B,), np.int32)
        for j, i in enumerate(idxs):
            ids = np.asarray(id_sequences[i][: U - 1], np.int32)
            L = len(ids) + 1
            tokens[j, 1:L] = ids
            targets[j, :L - 1] = ids
            lens[j] = L
        out = np.asarray(score(jnp.asarray(tokens), jnp.asarray(targets),
                               jnp.asarray(lens)))
        for j, i in enumerate(idxs):
            results[i] = out[j]
    return results


def perplexity(model, params, id_sequences):
    nll = sentence_nll(model, params, id_sequences)
    tokens = sum(len(s) + 1 for s in id_sequences)
    return float(np.exp(nll.sum() / max(tokens, 1)))
