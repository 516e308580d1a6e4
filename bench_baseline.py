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

    def step(self, tokens, states, feats, avg, sentiment, prior_mean, prior_var,
             oae=None):
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
        if oae is not None:
            # mode-2: per-step attention-weighted attribute-embedding prior
            # (reference updown_cell.py:160-163)
            prior_mean = torch.bmm(alpha.unsqueeze(1), oae).squeeze(1)
        z = torch.randn(g, self.Z) * prior_var.sqrt() + prior_mean
        hd, cd = self.dec_lstm(
            torch.cat([att, h1, states["hd"], sentiment, z], 1),
            (states["hd"], states["cd"]))
        logits = self.out(torch.tanh(self.out_proj(hd)))
        return torch.log_softmax(logits, -1), {"h1": h1, "c1": c1, "hd": hd, "cd": cd}


@torch.no_grad()
def reference_cbs_decode(model, feats, fsm, sentiment, beam=5, pnbs=2, T=20,
                         end=1, oae=None):
    """Dense CBS with the reference's per-target-state Python loop.
    ``oae`` (1, N, Z): mode-2 attribute embeddings → per-step
    attention-weighted prior (config-4 anchor)."""
    S, _, V = fsm.shape
    B = 1
    avg = feats.mean(1)
    pm = torch.zeros(B, model.Z) + sentiment
    pv = torch.ones(B, model.Z)
    lp0, state = model.step(torch.full((B,), end, dtype=torch.long), None,
                            feats, avg, sentiment, pm, pv, oae=oae)
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
    oaex = (oae.expand(groups, *oae.shape[1:]).contiguous()
            if oae is not None else None)
    state = {k: v.expand(groups, -1).contiguous() for k, v in state.items()}

    after_end = torch.full((V,), float("-inf"))
    after_end[end] = 0.0
    fsm_t = torch.from_numpy(fsm)

    for _ in range(T - 1):
        last = predictions[-1].reshape(groups)
        lp, state = model.step(last, state, featsx, avgx, sx, pmx, pvx,
                               oae=oaex)
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


def _bottleneck(cin, cmid, cout, stride=1):
    layers = torch.nn.Sequential(
        torch.nn.Conv2d(cin, cmid, 1, bias=False), torch.nn.BatchNorm2d(cmid),
        torch.nn.ReLU(inplace=True),
        torch.nn.Conv2d(cmid, cmid, 3, stride=stride, padding=1, bias=False),
        torch.nn.BatchNorm2d(cmid), torch.nn.ReLU(inplace=True),
        torch.nn.Conv2d(cmid, cout, 1, bias=False), torch.nn.BatchNorm2d(cout))
    down = (torch.nn.Sequential(
        torch.nn.Conv2d(cin, cout, 1, stride=stride, bias=False),
        torch.nn.BatchNorm2d(cout)) if (cin != cout or stride != 1) else None)
    return layers, down


class TorchRefFRCNN(torch.nn.Module):
    """res101 Faster-R-CNN extraction transcription (reference semantics,
    CPU): conv1→layer3 trunk (stride 16), RPN 3×3 conv + heads, proposal
    decode + greedy NMS → top-300 RoIs, 7×7 RoIAlign (sampling_ratio 2),
    layer4 + global-avg-pool → 2048-d bottom-up features, cls/bbox/attr
    heads, per-class test NMS + top-100 cap — the per-image work of
    frcnn/test_net.py:311-542. Random weights; this anchors TIME, not
    accuracy."""

    BLOCKS = {1: (3, 64, 256, 1), 2: (4, 128, 512, 2), 3: (23, 256, 1024, 2),
              4: (3, 512, 2048, 2)}

    def __init__(self, n_cls=81, n_att=106):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(64)
        self.pool = torch.nn.MaxPool2d(3, 2, 1)
        self.stages = torch.nn.ModuleList()
        cin = 64
        for i in (1, 2, 3, 4):
            n, cmid, cout, stride = self.BLOCKS[i]
            blocks = torch.nn.ModuleList()
            for b in range(n):
                layers, down = _bottleneck(cin, cmid, cout,
                                           stride if b == 0 else 1)
                blocks.append(torch.nn.ModuleDict(
                    {"m": layers, **({"d": down} if down else {})}))
                cin = cout
            self.stages.append(blocks)
        self.rpn_conv = torch.nn.Conv2d(1024, 512, 3, padding=1)
        self.rpn_cls = torch.nn.Conv2d(512, 24, 1)   # 12 anchors × 2
        self.rpn_box = torch.nn.Conv2d(512, 48, 1)
        self.cls = torch.nn.Linear(2048, n_cls)
        self.box = torch.nn.Linear(2048, n_cls * 4)
        self.att = torch.nn.Linear(2048, n_att)

    def _run_stage(self, x, i):
        for blk in self.stages[i]:
            idn = blk["d"](x) if "d" in blk else x
            x = torch.relu(blk["m"](x) + idn)
        return x

    def trunk(self, img):
        x = self.pool(torch.relu(self.bn1(self.conv1(img))))
        x = self._run_stage(x, 0)
        x = self._run_stage(x, 1)
        return self._run_stage(x, 2)        # (1, 1024, H/16, W/16)


def _greedy_nms(boxes, scores, thresh):
    order = scores.argsort(descending=True)
    keep = []
    while order.numel():
        i = int(order[0])
        keep.append(i)
        if order.numel() == 1:
            break
        rest = order[1:]
        xx1 = torch.maximum(boxes[i, 0], boxes[rest, 0])
        yy1 = torch.maximum(boxes[i, 1], boxes[rest, 1])
        xx2 = torch.minimum(boxes[i, 2], boxes[rest, 2])
        yy2 = torch.minimum(boxes[i, 3], boxes[rest, 3])
        inter = (xx2 - xx1 + 1).clamp(min=0) * (yy2 - yy1 + 1).clamp(min=0)
        a_i = (boxes[i, 2] - boxes[i, 0] + 1) * (boxes[i, 3] - boxes[i, 1] + 1)
        a_r = (boxes[rest, 2] - boxes[rest, 0] + 1) * (boxes[rest, 3] - boxes[rest, 1] + 1)
        iou = inter / (a_i + a_r - inter)
        order = rest[iou <= thresh]
    return torch.tensor(keep, dtype=torch.long)


def _roi_align(fmap, rois, out=7, samples=2, stride=16.0):
    """Bilinear 7×7 RoIAlign (csrc/cuda/ROIAlign_cuda.cu semantics)."""
    C = fmap.shape[1]
    H, W = fmap.shape[2], fmap.shape[3]
    R = rois.shape[0]
    x1, y1, x2, y2 = (rois[:, i] / stride for i in range(4))
    bw = ((x2 - x1).clamp(min=1.0) / out)[:, None, None]   # (R,1,1)
    bh = ((y2 - y1).clamp(min=1.0) / out)[:, None, None]
    gi = torch.arange(out, dtype=torch.float32)
    sj = (torch.arange(samples, dtype=torch.float32) + 0.5) / samples
    # per-roi sample coords: ys/xs (R, out, samples)
    ys = (y1[:, None, None]
          + (gi[None, :, None] + sj[None, None, :]) * bh).clamp(0, H - 1)
    xs = (x1[:, None, None]
          + (gi[None, :, None] + sj[None, None, :]) * bw).clamp(0, W - 1)
    y0, x0 = ys.floor().long(), xs.floor().long()
    y1i, x1i = (y0 + 1).clamp(max=H - 1), (x0 + 1).clamp(max=W - 1)
    wy, wx = ys - y0.float(), xs - x0.float()
    flat = fmap[0].reshape(C, -1)                       # (C, H*W)

    def g(yi, xi):   # (R,out,s) × (R,out,s) → (C, R, out, out, s, s)
        idx = (yi[:, :, None, :, None] * W
               + xi[:, None, :, None, :]).reshape(R, -1)
        return flat[:, idx].reshape(C, R, out, out, samples, samples)

    v00, v01 = g(y0, x0), g(y0, x1i)
    v10, v11 = g(y1i, x0), g(y1i, x1i)
    wyb = wy.reshape(1, R, out, 1, samples, 1)
    wxb = wx.reshape(1, R, 1, out, 1, samples)
    val = (v00 * (1 - wyb) * (1 - wxb) + v01 * (1 - wyb) * wxb
           + v10 * wyb * (1 - wxb) + v11 * wyb * wxb)
    return val.mean(dim=(4, 5)).permute(1, 0, 2, 3)     # (R, C, 7, 7)


@torch.no_grad()
def reference_extract(model, img, pre_nms=6000, post_nms=300, n_cls=81):
    """Per-image bottom-up extraction (test_net.py:311-542 shape)."""
    fmap = model.trunk(img)
    H, W = fmap.shape[2], fmap.shape[3]
    r = torch.relu(model.rpn_conv(fmap))
    scores = model.rpn_cls(r)[:, 12:].reshape(-1)       # fg scores
    deltas = model.rpn_box(r).reshape(4, -1).t()
    # anchors: 12 per cell (scales 4,8,16,32 × ratios .5,1,2), stride 16
    ys, xs = torch.meshgrid(torch.arange(H) * 16.0, torch.arange(W) * 16.0,
                            indexing="ij")
    sizes = []
    for sc in (64, 128, 256, 512):
        for ratio in (0.5, 1.0, 2.0):
            w = sc * (ratio ** 0.5)
            sizes.append((w, sc / (ratio ** 0.5)))
    ctr = torch.stack([xs.reshape(-1), ys.reshape(-1)], 1)
    anchors = torch.cat([
        torch.cat([ctr - torch.tensor(s) / 2, ctr + torch.tensor(s) / 2], 1)
        for s in sizes])
    wh = (anchors[:, 2:] - anchors[:, :2] + 1)
    c = anchors[:, :2] + wh / 2
    nc = c + deltas[:, :2] * wh
    nwh = wh * deltas[:, 2:].clamp(max=4.0).exp()
    boxes = torch.cat([nc - nwh / 2, nc + nwh / 2], 1)
    boxes[:, 0::2] = boxes[:, 0::2].clamp(0, W * 16 - 1)
    boxes[:, 1::2] = boxes[:, 1::2].clamp(0, H * 16 - 1)
    top = scores.argsort(descending=True)[:pre_nms]
    keep = _greedy_nms(boxes[top], scores[top], 0.7)[:post_nms]
    rois = boxes[top][keep]
    pooled = _roi_align(fmap, rois)                      # (300, 1024, 7, 7)
    feat = model._run_stage(pooled, 3).mean(dim=(2, 3))  # (300, 2048)
    cls_prob = torch.softmax(model.cls(feat), -1)
    _ = model.box(feat)
    _ = torch.sigmoid(model.att(feat))
    # per-class test NMS + global top-100 cap (test_net.py:379-482)
    kept = []
    for c_i in range(1, n_cls):
        sc = cls_prob[:, c_i]
        sel = sc > 0.5
        if sel.any():
            k = _greedy_nms(rois[sel], sc[sel], 0.3)
            kept.append(sc[sel][k])
    if kept:
        allsc = torch.cat(kept).sort(descending=True).values[:100]
    return feat


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

    # config-4 anchor: mode-2 prior (attention-weighted attribute
    # embeddings, updown_cell.py:160-174) 20-z CBS loop + top-1 oracle
    # CIDEr re-score (eval/eval.py:350-437), per image
    from style_seqcvae_tpu.evaluation.metrics import Cider

    oae = torch.randn(1, 100, model.Z)
    reference_cbs_decode(model, feats, fsm, sentiment, beam=beam, T=T, oae=oae)
    gts = {0: ["the 17 42 9 3 11 5", "a 17 9 42 3"]}
    cider = Cider()
    corpus = cider.make_corpus(gts)
    n_images4 = 2
    t0 = time.time()
    for img_i in range(n_images4):
        cands = []
        for _ in range(n_z):          # sequential z-loop (inference.py:138)
            preds, lp = reference_cbs_decode(model, feats, fsm, sentiment,
                                             beam=beam, T=T, oae=oae)
            toks = [int(p.reshape(-1, beam)[0, 0]) for p in preds]
            cands.append("the " + " ".join(str(t % 50) for t in toks[:8]))
        # oracle: per-z scores → argmax → re-score (eval.py:350-437)
        scores = [cider.compute_score(gts, {0: [c]}, corpus=corpus)[0]
                  for c in cands]
        best = cands[int(np.argmax(scores))]
        cider.compute_score(gts, {0: [best]}, corpus=corpus)
    mode2_caps_per_sec = n_images4 * n_z / (time.time() - t0)

    # config-5 anchor: per-image res101 extract (test_net.py:311-542) +
    # the 20-z CBS decode per image — the full reference chain, CPU
    det = TorchRefFRCNN().eval()
    img = torch.randn(1, 3, 608, 928)
    reference_extract(det, img)       # warm-up (allocator, BN folding)
    n_images5 = 2
    t0 = time.time()
    for _ in range(n_images5):
        reference_extract(det, img)
    extract_s = (time.time() - t0) / n_images5
    # per-image e2e = extract + n_z sequential CBS decodes (measured above)
    e2e_images_per_sec = 1.0 / (extract_s + n_z / caps_per_sec)

    out = {"reference_captions_per_sec": round(caps_per_sec, 3),
           "reference_greedy_captions_per_sec": round(greedy_per_sec, 3),
           "reference_train_captions_per_sec": round(train_caps_per_sec, 3),
           "reference_mode2_oracle_captions_per_sec": round(mode2_caps_per_sec, 3),
           "reference_e2e_images_per_sec": round(e2e_images_per_sec, 4),
           "reference_extract_s_per_image": round(extract_s, 2),
           "hardware": "host CPU (torch %s)" % torch.__version__,
           "note": "reference algorithm shape: bs=1, sequential z-loop, dense-FSM CBS"}
    with open("BASELINE_MEASURED.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
