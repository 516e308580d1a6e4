"""Baseline measurement: the REFERENCE algorithm shape executed by torch on
this host (CPU — the CUDA 9.0-era GPU of the reference is unavailable).

Re-creates the reference inference path faithfully at the algorithmic level:
bs=1 (forced, var_updown/scripts/inference.py:89-95), a Python loop over 20
z-samples (inference.py:138), dense-FSM ConstrainedBeamSearch with a Python
loop over FSM states per timestep (updown-baseline/updown/modules/
cbs.py:200-226), image features replicated to batch*states*beam
(updown_captioner.py:405-424), per-step torch.randn z-sampling.

Writes BASELINE_MEASURED.json consumed by bench.py's ``vs_baseline``.
"""

import json
import time

import numpy as np
import torch


class TorchRefDecoder(torch.nn.Module):
    """Reference-wiring UpDown cell + tied output head (inference path)."""

    def __init__(self, V, F=2048, E=600, H=900, P=768, Z=150):
        super().__init__()
        self.attn_lstm = torch.nn.LSTMCell(E + F + 2 * H, H)
        self.dec_lstm = torch.nn.LSTMCell(1 + F + 2 * H + Z, H)  # sentiment_vae=1
        self.wq = torch.nn.Linear(H, P, bias=False)
        self.wv = torch.nn.Linear(F, P, bias=False)
        self.wa = torch.nn.Linear(P, 1, bias=False)
        self.emb = torch.nn.Embedding(V, E)
        self.out_proj = torch.nn.Linear(H, E)
        self.out = torch.nn.Linear(E, V, bias=False)
        self.out.weight = self.emb.weight
        self.H, self.Z = H, Z

    def step(self, tokens, states, feats, avg, sentiment, prior_mean, prior_var):
        g = tokens.shape[0]
        if states is None:
            z = feats.new_zeros((g, self.H))
            states = {k: z.clone() for k in ("h1", "c1", "hd", "cd")}
        e = self.emb(tokens)
        h1, c1 = self.attn_lstm(
            torch.cat([e, avg, states["h1"], states["hd"]], 1),
            (states["h1"], states["c1"]))
        alpha = torch.softmax(
            self.wa(torch.tanh(self.wq(h1).unsqueeze(1) + self.wv(feats))).squeeze(-1), -1)
        att = (alpha.unsqueeze(-1) * feats).sum(1)
        z = torch.randn(g, self.Z) * prior_var.sqrt() + prior_mean
        hd, cd = self.dec_lstm(
            torch.cat([att, h1, states["hd"], sentiment, z], 1),
            (states["hd"], states["cd"]))
        logits = self.out(torch.tanh(self.out_proj(hd)))
        return torch.log_softmax(logits, -1), {"h1": h1, "c1": c1, "hd": hd, "cd": cd}


@torch.no_grad()
def reference_cbs_decode(model, feats, fsm, sentiment, beam=5, pnbs=2, T=20, end=1):
    """Dense CBS with the reference's per-target-state Python loop."""
    S, _, V = fsm.shape
    B = 1
    avg = feats.mean(1)
    pm = torch.zeros(B, model.Z) + sentiment
    pv = torch.ones(B, model.Z)
    lp0, state = model.step(torch.full((B,), end, dtype=torch.long), None,
                            feats, avg, sentiment, pm, pv)
    ssp = lp0.view(B, 1, V).expand(B, S, V).masked_fill(
        torch.from_numpy((fsm[0] == 0)).unsqueeze(0), float("-inf"))
    last_lp, preds = ssp.topk(beam)
    predictions = [preds.reshape(B, -1)]

    groups = B * S * beam
    featsx = feats.unsqueeze(1).expand(B, S * beam, *feats.shape[1:]).reshape(groups, *feats.shape[1:])
    avgx = featsx.mean(1)
    sx = sentiment.expand(groups, 1)
    pmx = pm.expand(groups, model.Z)
    pvx = pv.expand(groups, model.Z)
    state = {k: v.expand(groups, -1).contiguous() for k, v in state.items()}

    after_end = torch.full((V,), float("-inf"))
    after_end[end] = 0.0
    fsm_t = torch.from_numpy(fsm)

    for _ in range(T - 1):
        last = predictions[-1].reshape(groups)
        lp, state = model.step(last, state, featsx, avgx, sx, pmx, pvx)
        lp = torch.where((last == end).unsqueeze(-1), after_end, lp)
        lp = lp.view(B, S, beam, V)
        new_preds = torch.zeros(B, S, beam, dtype=torch.long)
        new_lp = torch.zeros(B, S, beam)
        new_bp = torch.zeros(B, S, beam, dtype=torch.long)
        exp_last = last_lp.view(B, S, beam, 1).expand(B, S, beam, pnbs)
        for i in range(S):
            slp = lp.masked_fill((fsm_t[:, i, :] == 0).view(1, S, 1, V), -1e20)
            t_lp, t_cls = slp.topk(pnbs)
            summed = (t_lp + exp_last).reshape(B, -1)
            cls = t_cls.reshape(B, -1)
            s_lp, s_idx = summed.topk(beam)
            new_lp[:, i] = s_lp
            new_preds[:, i] = cls.gather(1, s_idx)
            new_bp[:, i] = s_idx // pnbs
        predictions.append(new_preds.reshape(B, -1))
        bp = new_bp.reshape(B, -1)
        state = {k: v.reshape(B, S * beam, -1).gather(
            1, bp.unsqueeze(-1).expand(B, S * beam, v.shape[-1])).reshape(groups, -1)
            for k, v in state.items()}
        last_lp = new_lp
    return predictions, last_lp


@torch.no_grad()
def reference_greedy_decode(model, feats, sentiment, T=20, end=1):
    """Greedy decode at the reference loop shape (bs=1, per-token Python
    loop, updown_captioner.py:324-366 with beam_size=1)."""
    B = 1
    avg = feats.mean(1)
    pm = torch.zeros(B, model.Z) + sentiment
    pv = torch.ones(B, model.Z)
    lp, state = model.step(torch.full((B,), end, dtype=torch.long), None,
                           feats, avg, sentiment, pm, pv)
    toks = [int(lp.argmax(-1))]
    for _ in range(T - 1):
        lp, state = model.step(torch.tensor([toks[-1]]), state, feats, avg,
                               sentiment, pm, pv)
        toks.append(end if toks[-1] == end else int(lp.argmax(-1)))
    return toks


def reference_train_step(model, opt, feats, tokens, sentiment, end=1):
    """One teacher-forced step: per-token loop, masked CE + KL surrogate —
    the reference training iteration shape (var_updown/scripts/train.py:154-188).
    Posterior heads are approximated by the prior (the torch replica has no
    encoder LSTM); the per-token compute and backward sizes match."""
    B, T = tokens.shape
    avg = feats.mean(1)
    pm = torch.zeros(B, model.Z) + sentiment
    pv = torch.ones(B, model.Z)
    state = None
    nll = 0.0
    prev = torch.full((B,), end, dtype=torch.long)
    for t in range(T):
        lp, state = model.step(prev, state, feats, avg, sentiment, pm, pv)
        nll = nll - lp.gather(1, tokens[:, t:t + 1]).mean()
        prev = tokens[:, t]
    opt.zero_grad()
    nll.backward()
    opt.step()
    return float(nll)


def main():
    V, S, T, beam, n_z = 10500, 8, 20, 5, 20
    torch.manual_seed(0)
    model = TorchRefDecoder(V).eval()
    feats = torch.randn(1, 100, 2048)
    sentiment = torch.ones(1, 1)
    rng = np.random.RandomState(0)
    fsm = np.zeros((S, S, V), np.uint8)
    for s in range(S):
        fsm[s, s, :] = 1
    for c in range(3):
        stride = 2 ** c
        for s in range(S):
            if not (s & stride) and (s | stride) < S:
                for t in rng.randint(2, V, 2):
                    fsm[s, s | stride, t] = 1
                    fsm[s, s, t] = 0

    # one warm-up decode, then time n_images x n_z
    reference_cbs_decode(model, feats, fsm, sentiment, beam=beam, T=T)
    n_images = 2
    t0 = time.time()
    for _ in range(n_images):
        for _ in range(n_z):          # reference z-loop (inference.py:138)
            reference_cbs_decode(model, feats, fsm, sentiment, beam=beam, T=T)
    dt = time.time() - t0
    caps_per_sec = n_images * n_z / dt

    # config-1 anchor: greedy, bs=1 loop over images
    reference_greedy_decode(model, feats, sentiment, T=T)
    t0 = time.time()
    n_greedy = 8
    for _ in range(n_greedy):
        reference_greedy_decode(model, feats, sentiment, T=T)
    greedy_per_sec = n_greedy / (time.time() - t0)

    # config-2 anchor: training step, bs=32 teacher-forced fwd+bwd
    train_model = TorchRefDecoder(V).train()
    opt = torch.optim.SGD(train_model.parameters(), lr=0.001)
    bs = 32
    tfeats = torch.randn(bs, 100, 2048)
    ttokens = torch.randint(2, V, (bs, T))
    tsent = torch.ones(bs, 1)
    reference_train_step(train_model, opt, tfeats, ttokens, tsent)
    t0 = time.time()
    n_steps = 3
    for _ in range(n_steps):
        reference_train_step(train_model, opt, tfeats, ttokens, tsent)
    train_caps_per_sec = n_steps * bs / (time.time() - t0)

    out = {"reference_captions_per_sec": round(caps_per_sec, 3),
           "reference_greedy_captions_per_sec": round(greedy_per_sec, 3),
           "reference_train_captions_per_sec": round(train_caps_per_sec, 3),
           "hardware": "host CPU (torch %s)" % torch.__version__,
           "note": "reference algorithm shape: bs=1, sequential z-loop, dense-FSM CBS"}
    with open("BASELINE_MEASURED.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
