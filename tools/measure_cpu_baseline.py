"""One-off measurement of the CPU torch reference throughput baseline.

Replicates the reference's GradCache hot loop cost structure
(/root/reference/modules/training_utils.py:92-155) with torch on CPU:
per global batch of 256 pairs (16 sub-batches x 16),
  - cached no-grad ESM-2 150M forward per side per sub-batch,
  - global 256x256 InfoNCE over concatenated embeddings,
  - closure replay: second ESM forward + head backward per sub-batch.
ESM weights are random (throughput is weight-independent). Sequence length
profile matches bench.py's workload: peptides ~8-30 aa, receptors ~100-500 aa,
padded per sub-batch to the longest (reference semantics).

Writes bench_baseline.json {"cpu_pairs_per_sec": ..., "methodology": ...}.
Run once: python tools/measure_cpu_baseline.py [--sub-batches N]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sub-batches", type=int, default=4,
                    help="sub-batches to time (extrapolated to 16)")
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--out", default="bench_baseline.json")
    args = ap.parse_args()

    import numpy as np
    import torch
    import torch.nn as nn
    from transformers import EsmConfig, EsmModel

    torch.manual_seed(0)
    cfg = EsmConfig(
        vocab_size=33, hidden_size=640, num_hidden_layers=30,
        num_attention_heads=20, intermediate_size=2560,
        max_position_embeddings=1026, position_embedding_type="rotary",
        pad_token_id=1, mask_token_id=32, token_dropout=True,
        emb_layer_norm_before=False, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, attn_implementation="eager",
    )
    esm = EsmModel(cfg, add_pooling_layer=False)
    esm.eval()
    for p in esm.parameters():
        p.requires_grad = False

    dim = 128

    def ffn(depth=2):
        layers = [nn.Sequential(nn.Linear(dim, dim), nn.ReLU(),
                                nn.LayerNorm(dim), nn.Dropout(0.1))
                  for _ in range(depth - 1)]
        layers.append(nn.Linear(dim, dim))
        return nn.Sequential(*layers)

    class Head(nn.Module):
        def __init__(self):
            super().__init__()
            self.proj = nn.Linear(640, dim)
            self.aa = ffn()
            self.emb = ffn()

        def forward(self, ids, mask, t):
            h = esm(input_ids=ids, attention_mask=mask).last_hidden_state
            x = self.aa(self.proj(h))
            s = (x * mask.unsqueeze(-1)).sum(1) / mask.sum(1, keepdim=True).clamp(min=1)
            x = self.emb(s)
            x = torch.nn.functional.normalize(x, dim=-1)
            return x * torch.exp(t / 2)

    pep_head, rec_head = Head(), Head()
    temp = nn.Parameter(torch.tensor(1.0))
    opt = torch.optim.Adam(
        list(pep_head.parameters()) + list(rec_head.parameters()) + [temp],
        lr=1e-3)

    rng = np.random.default_rng(0)
    B = args.batch_size

    def make_batch(lo, hi):
        lens = rng.integers(lo, hi, B)
        T = int(lens.max()) + 2
        ids = np.full((B, T), 1, np.int64)
        mask = np.zeros((B, T), np.int64)
        for i, L in enumerate(lens):
            ids[i, 0] = 0
            ids[i, 1:L + 1] = rng.integers(4, 24, L)
            ids[i, L + 1] = 2
            mask[i, :L + 2] = 1
        return torch.tensor(ids), torch.tensor(mask)

    def contrastive(x, y):
        logits = x @ y.t()
        exp_l = torch.exp(logits)
        d = torch.diag(logits)
        lr_ = -torch.mean(torch.log(torch.exp(d) / exp_l.sum(1)))
        lp_ = -torch.mean(torch.log(torch.exp(d) / exp_l.sum(0)))
        return 0.5 * (lr_ + lp_)

    n_sub = args.sub_batches
    batches = [(make_batch(8, 30), make_batch(100, 500)) for _ in range(n_sub)]

    # warmup one sub-batch (allocator, thread pools)
    (pi, pm), (ri, rm) = batches[0]
    with torch.no_grad():
        pep_head(pi, pm, temp)

    t0 = time.perf_counter()
    # pass 1: cached forwards (no grad) — GradCache @cached semantics
    cache_x, cache_y = [], []
    for (pi, pm), (ri, rm) in batches:
        with torch.no_grad():
            cache_x.append(pep_head(pi, pm, temp))
            cache_y.append(rec_head(ri, rm, temp))
    x = torch.cat(cache_x).detach().requires_grad_(True)
    y = torch.cat(cache_y).detach().requires_grad_(True)
    loss = contrastive(x, y)
    loss.backward()
    # pass 2: closure replay — re-forward with grad, backprop cotangents
    opt.zero_grad()
    for k, ((pi, pm), (ri, rm)) in enumerate(batches):
        rx = pep_head(pi, pm, temp)
        gx = x.grad[k * B:(k + 1) * B]
        rx.backward(gx)
        ry = rec_head(ri, rm, temp)
        gy = y.grad[k * B:(k + 1) * B]
        ry.backward(gy)
    opt.step()
    dt = time.perf_counter() - t0

    pairs_per_sec = n_sub * B / dt
    out = {
        "cpu_pairs_per_sec": pairs_per_sec,
        "sub_batches_timed": n_sub,
        "batch_size": B,
        "seconds": dt,
        "methodology": (
            "torch CPU, reference GradCache structure: frozen random-weight "
            "ESM-2 150M double forward (cached + replay) per sub-batch, "
            "reference heads + naive InfoNCE, Adam step. Peptides 8-30aa, "
            "receptors 100-500aa, pad-to-longest per sub-batch."),
    }
    Path(args.out).write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
