"""Execute the BASELINE.md parity protocol (configs 1-5) and write PARITY.json.

For every config the SAME dataset, split, optimizer (Adam), learning rate,
batch size and epoch budget are used to train (a) our TPU-native
implementation through its real public pipeline (Pipeline + Trainer) and
(b) a PyTorch twin of the reference's model math (parity/torch_twin.py —
the reference package itself cannot execute on torch 2.13, which removed the
named-tensor API it is written against) under a minimal torch Adam loop.
Held-out AUC/logloss (CTR) or NDCG@10 (LTR) are recorded side by side.

Dataset note: the build environment has NO network egress, so the protocol's
Criteo/MovieLens subsets are substituted with the bundled deterministic
synthetic datasets (``make_synthetic_ctr`` — Zipf ids + planted FM-style
pairwise interactions; a latent-factor implicit-feedback set for config 5).
The comparison is still reference-algorithm-vs-ours on identical data, which
is what "parity within run-to-run variance" requires.

Run:  python parity/run_parity.py          (CPU, ~10-20 min, deterministic)
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import torch  # noqa: E402

from parity import ref_oracle, torch_twin  # noqa: E402
from torecsys_tpu.data import make_synthetic_ctr  # noqa: E402
from torecsys_tpu.inputs import (  # noqa: E402
    Inputs,
    MultiIndicesEmbedding,
    MultiIndicesFieldAwareEmbedding,
    StackedInput,
    ValueInput,
)
from torecsys_tpu.train import Pipeline, Trainer  # noqa: E402

FIELD_SIZES = (200, 100, 100, 50, 50, 20)
N_FIELDS = len(FIELD_SIZES)
# High-signal regime (r2 verdict): pure-categorical data with boosted planted
# interactions.  Raw dense values were dropped because the reference's
# FM-family models consume feat_inputs as an UNWEIGHTED sum (deep_fm.py:55 —
# a per-id learnable weight exists only for categorical ids via the 1-dim
# embedding), so unscaled dense columns enter with a fixed coefficient of 1
# on both sides and only add noise neither side can fit — that artifact, not
# the interaction math, produced r2's interaction-models-below-LR table.
NUM_DENSE = 0
PAIR_SCALE = 2.0
ROWS, TRAIN = 120_000, 100_000
N_SEEDS = 5  # per side, configs 1-4 (config 5 uses 4, below)
E = 8
EPOCHS = 6
LR = 3e-3
BATCH = 1024
CAT = tuple(f"cat_{i}" for i in range(N_FIELDS))
DENSE = tuple(f"dense_{j}" for j in range(NUM_DENSE))
VOCAB = int(sum(FIELD_SIZES))
OFFSETS = np.concatenate([[0], np.cumsum(FIELD_SIZES)[:-1]]).astype(np.int64)


def loader(data, lo, hi, shuffle_seed=None):
    """Batch loader; with ``shuffle_seed`` the rows reshuffle every epoch —
    essential for LTR with in-batch negative mining (a fixed batch order
    freezes each anchor's negative pool)."""
    state = {"epoch": 0}

    def gen():
        idx = np.arange(lo, hi)
        if shuffle_seed is not None:
            rng = np.random.default_rng(shuffle_seed + state["epoch"])
            rng.shuffle(idx)
            state["epoch"] += 1
        for s in range(0, len(idx) - BATCH + 1, BATCH):
            sl = idx[s:s + BATCH]
            yield {k: v[sl] for k, v in data.items()}
    return gen


def feat_schema():
    """First-order inputs: a 1-dim embedding of the categorical fields (the
    reference notebooks' feat_inputs idiom; per-id learnable weight)."""
    if NUM_DENSE == 0:
        return MultiIndicesEmbedding(embed_size=1, field_sizes=FIELD_SIZES,
                                     fields=CAT)
    return StackedInput(inputs=(
        ValueInput(fields=DENSE),
        MultiIndicesEmbedding(embed_size=1, field_sizes=FIELD_SIZES, fields=CAT),
    ))


def run_ours(data, model, schema, criterion="BCEWithLogitsLoss", seed=0,
             matched_init=False, **model_kwargs):
    import contextlib

    p = (
        Pipeline()
        .set_objective("ctr")
        .set_inputs(Inputs(schema=schema))
        .set_model(model, **model_kwargs)
        .set_criterion(criterion)
        .set_optimizer("Adam", lr=LR)
        .set_target_fields("label")
    )
    tr = Trainer(p, log_every=1_000_000, seed=seed)
    t0 = time.time()
    # matched_init: initialize Dense layers exactly like torch.nn.Linear
    # (layers.precision.use_torch_linear_init) — the falsification experiment
    # for r4's "DeepFM delta is the kaiming-uniform vs lecun-normal init"
    # attribution (VERDICT r4 ask #5)
    ctx = (__import__("torecsys_tpu.layers.precision", fromlist=["x"])
           .use_torch_linear_init() if matched_init
           else contextlib.nullcontext())
    with ctx:
        m = tr.fit(loader(data, 0, TRAIN), val_loader=loader(data, TRAIN, ROWS),
                   max_epochs=EPOCHS)
    return {"auc": round(m["val_auc"], 4), "logloss": round(m["val_logloss"], 4),
            "seconds": round(time.time() - t0, 1)}


def matched_init_experiment(model_name="DeepFM"):
    """Re-run OUR side of one CTR row with torch-matched Dense init and
    append the outcome to PARITY.json under ``experiments``.

    Interpretation contract (written before running): if the matched-init
    mean moves the delta-of-means inside the recorded seed band, the r4 init
    attribution is CONFIRMED; if the delta persists, it is FALSIFIED and
    PARITY.md must say what else differs.
    """
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PARITY.json")
    with open(out_path) as f:
        results = json.load(f)
    row = None
    for cfg in results["configs"].values():
        if model_name in cfg:
            row = cfg[model_name]
    assert row is not None, f"no recorded parity row for {model_name}"

    data = make_synthetic_ctr(
        num_rows=ROWS, field_sizes=FIELD_SIZES, num_dense=NUM_DENSE, seed=7,
        pair_scale=PAIR_SCALE,
    )
    reg_name, meta, kwargs = OUR_SPECS[model_name]
    print(f"== matched-init {model_name}: ours x{N_SEEDS} ...", flush=True)
    runs = [run_ours(data, reg_name, build_schema(meta["schema"]),
                     criterion=meta.get("criterion", "BCEWithLogitsLoss"),
                     seed=sd, matched_init=True, **kwargs)
            for sd in range(N_SEEDS)]
    aucs = [r["auc"] for r in runs]
    mean = round(float(np.mean(aucs)), 4)
    ref_mean = row["reference"]["auc_mean"]
    band = row["auc_seed_band_max"]
    delta = round(mean - ref_mean, 4)
    rec = {
        "hypothesis": "r4 attribution: the consistent-direction DeepFM AUC "
                      "delta comes from torch kaiming-uniform vs flax "
                      "lecun-normal Dense init",
        "ours_matched_init_auc_per_seed": aucs,
        "ours_matched_init_auc_mean": mean,
        "ours_default_init_auc_mean": row["ours"]["auc_mean"],
        "reference_auc_mean": ref_mean,
        "auc_delta_of_means": delta,
        "auc_seed_band_max": band,
        "delta_within_band": bool(abs(delta) <= band + 1e-9),
        "verdict": ("CONFIRMED: matched init closes the delta"
                    if abs(delta) <= band + 1e-9 else
                    "FALSIFIED: delta persists under matched init"),
    }
    print(json.dumps(rec, indent=2), flush=True)
    results.setdefault("experiments", {})[f"{model_name}_matched_init"] = rec
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out_path)


def oracle_inputs(data):
    """Shared torch-side input tensors: fused offset ids (+ dense values)."""
    ids = np.stack([data[c] for c in CAT], axis=1).astype(np.int64) + OFFSETS
    dense = np.stack([data[d] for d in DENSE], axis=1).astype(np.float32) \
        if NUM_DENSE else np.zeros((len(ids), 0), np.float32)
    return torch.from_numpy(ids), torch.from_numpy(dense)


def run_reference(data, name, seed=0):
    """Train the reference-twin torch model (parity oracle) on the same data.

    The reference package itself cannot execute on torch 2.13 (named tensors
    removed) — see parity/torch_twin.py for the twin's math provenance.
    ``seed`` varies table init, model init, and the epoch shuffles — the same
    sources of run-to-run variance a real reference run would have.
    """
    ids_t, dense_t = oracle_inputs(data)
    labels = data["label"]
    feat_tbl = ref_oracle.fused_feat_table(VOCAB, seed=seed)
    emb_tbl = ref_oracle.fused_emb_table(VOCAB, E, seed=seed)
    torch.manual_seed(1000 + seed)  # model-parameter init

    def feat(sl):
        if NUM_DENSE == 0:
            return feat_tbl(ids_t[sl])
        return torch.cat([dense_t[sl].unsqueeze(-1), feat_tbl(ids_t[sl])], dim=1)

    if name == "LR":
        model = torch_twin.LR(inputs_size=NUM_DENSE + N_FIELDS)
        build = lambda sl: {"feat": feat(sl)}
        extra = (feat_tbl,)
    elif name == "FM":
        model = torch_twin.FM()
        build = lambda sl: {"feat": feat(sl), "emb": emb_tbl(ids_t[sl])}
        extra = (feat_tbl, emb_tbl)
    elif name == "FFM":
        fa_tbls = ref_oracle.field_aware_tables(VOCAB, E, N_FIELDS, seed=seed)
        model = torch_twin.FFM(num_fields=N_FIELDS)

        def build(sl):
            embs = torch.cat([t(ids_t[sl]) for t in fa_tbls], dim=1)
            return {"feat": feat(sl), "field_emb": embs}
        extra = (feat_tbl, fa_tbls)
    elif name == "DeepFM":
        model = torch_twin.DeepFM(E, N_FIELDS, [64, 64])
        build = lambda sl: {"feat": feat(sl), "emb": emb_tbl(ids_t[sl])}
        extra = (feat_tbl, emb_tbl)
    elif name == "NFM":
        model = torch_twin.NFM(E, [64, 64])
        build = lambda sl: {"feat": feat(sl), "emb": emb_tbl(ids_t[sl])}
        extra = (feat_tbl, emb_tbl)
    elif name == "DCN":
        model = torch_twin.DCN(E, N_FIELDS, 16, [64, 64], 2)
        build = lambda sl: {"emb": emb_tbl(ids_t[sl])}
        extra = (emb_tbl,)
    elif name in ("xDeepFM", "xDeepFM_noBN"):
        model = torch_twin.XDeepFM(E, N_FIELDS, [16, 16], [64, 64],
                                   use_batchnorm=(name == "xDeepFM"))
        build = lambda sl: {"feat": feat(sl), "emb": emb_tbl(ids_t[sl])}
        extra = (feat_tbl, emb_tbl)
    else:
        raise KeyError(name)

    t0 = time.time()
    auc, logloss = ref_oracle.train_and_eval_reference(
        model, build, labels, TRAIN, extra_params=[m for m in extra],
        batch_size=BATCH, epochs=EPOCHS, lr=LR, seed=seed,
    )
    return {"auc": round(auc, 4), "logloss": round(logloss, 4),
            "seconds": round(time.time() - t0, 1)}


# ---- config 5: NCF + BPR LTR with NDCG@10 -------------------------------

U_USERS, N_ITEMS, LATENT = 600, 1200, 8
LTR_ROWS, LTR_TRAIN = 60_000, 50_000
NCF_E = 16
EPOCHS_LTR = 5  # both sides plateau-adjacent here (trajectories match)


def make_implicit_data(seed=11):
    """Latent-factor implicit feedback: positives are high-affinity pairs."""
    rng = np.random.default_rng(seed)
    uf = rng.normal(0, 1.0, size=(U_USERS, LATENT))
    vf = rng.normal(0, 1.0, size=(N_ITEMS, LATENT))
    users = rng.integers(0, U_USERS, LTR_ROWS).astype(np.int32)
    # sample positives proportional to affinity: pick best of 8 random items
    cands = rng.integers(0, N_ITEMS, (LTR_ROWS, 8))
    scores = np.einsum("rk,rck->rc", uf[users], vf[cands])
    items = cands[np.arange(LTR_ROWS), scores.argmax(1)].astype(np.int32)
    return {"user": users, "item": items}, uf, vf


def ndcg_at_k(rank_of_pos: np.ndarray, k: int = 10) -> float:
    """Mean NDCG@k for lists with exactly one relevant item."""
    gain = np.where(rank_of_pos < k, 1.0 / np.log2(rank_of_pos + 2.0), 0.0)
    return float(gain.mean())  # IDCG == 1 (single relevant item at rank 0)


def eval_ndcg(score_pairs, data, seed=12, n_users=3000, n_cand=100):
    """Rank 1 held-out positive against 99 random negatives per user."""
    rng = np.random.default_rng(seed)
    eval_rows = rng.choice(np.arange(LTR_TRAIN, LTR_ROWS), n_users, replace=False)
    users = data["user"][eval_rows]
    pos = data["item"][eval_rows]
    negs = rng.integers(0, N_ITEMS, (n_users, n_cand - 1)).astype(np.int32)
    items = np.concatenate([pos[:, None], negs], axis=1)  # (U, C), col0 = pos
    u_rep = np.repeat(users, n_cand)
    scores = score_pairs(u_rep, items.reshape(-1)).reshape(n_users, n_cand)
    rank_of_pos = (scores > scores[:, :1]).sum(axis=1)
    return ndcg_at_k(rank_of_pos, k=10)


def run_ours_ncf_bpr(data, seed=0):
    inputs = Inputs(schema={
        "emb_inputs": MultiIndicesEmbedding(
            embed_size=NCF_E, field_sizes=(U_USERS, N_ITEMS),
            fields=("user", "item"),
        ),
    })
    p = (
        Pipeline()
        .set_objective("ltr")
        .set_inputs(inputs)
        .set_model("NCF", deep_layer_sizes=(32,))
        .set_criterion("BayesianPersonalizedRankingLoss")
        .set_optimizer("Adam", lr=LR)
        .set_miner("UniformBatchMiner", num_negs=1)
        .set_miner_target_field("item")
        .set_target_fields("label")
    )
    tr = Trainer(p, log_every=1_000_000, seed=seed)
    train = {k: v[:LTR_TRAIN] for k, v in data.items()}
    t0 = time.time()
    tr.fit(loader(train, 0, LTR_TRAIN, shuffle_seed=5), max_epochs=EPOCHS_LTR)

    def score_pairs(users, items):
        out = []
        for s in range(0, len(users), 8192):
            batch = {"user": users[s:s + 8192], "item": items[s:s + 8192]}
            out.append(np.asarray(tr.predict(batch)).reshape(-1))
        return np.concatenate(out)

    ndcg = eval_ndcg(score_pairs, data)
    return {"ndcg@10": round(ndcg, 4), "seconds": round(time.time() - t0, 1)}


def run_reference_ncf_bpr(data, seed=0):
    torch.manual_seed(seed)
    table = torch.nn.Embedding(U_USERS + N_ITEMS, NCF_E)
    torch.nn.init.normal_(table.weight, std=0.01)
    model = torch_twin.NCF(NCF_E, [32])
    opt = torch.optim.Adam(list(table.parameters()) + list(model.parameters()), lr=LR)
    users = torch.from_numpy(data["user"][:LTR_TRAIN].astype(np.int64))
    items = torch.from_numpy(data["item"][:LTR_TRAIN].astype(np.int64))
    gen = torch.Generator().manual_seed(seed)

    def emb(u, i):
        return torch.stack([table(u), table(i + U_USERS)], dim=1)

    t0 = time.time()
    model.train()
    for _ in range(EPOCHS_LTR):
        perm = torch.randperm(LTR_TRAIN, generator=gen)
        for s in range(0, LTR_TRAIN - BATCH + 1, BATCH):
            sl = perm[s:s + BATCH]
            batch_items = items[sl]
            # in-batch uniform negatives — the reference UniformBatchMiner's
            # semantics (miners/uniform_batch_miner.py:17-43)
            neg = batch_items[torch.randint(0, BATCH, (BATCH,), generator=gen)]
            opt.zero_grad()
            pos_out = model(emb(users[sl], batch_items)).reshape(-1)
            neg_out = model(emb(users[sl], neg)).reshape(-1)
            loss = -torch.nn.functional.logsigmoid(pos_out - neg_out).mean()
            loss.backward()
            opt.step()

    model.eval()

    def score_pairs(u, i):
        with torch.no_grad():
            ut = torch.from_numpy(u.astype(np.int64))
            it = torch.from_numpy(i.astype(np.int64))
            return model(emb(ut, it)).reshape(-1).numpy()

    ndcg = eval_ndcg(score_pairs, data)
    return {"ndcg@10": round(ndcg, 4), "seconds": round(time.time() - t0, 1)}


CONFIG_MODELS = {
    "config1_lr": ["LR"],
    "config2_fm_ffm": ["FM", "FFM"],
    "config3_deepfm_nfm": ["DeepFM", "NFM"],
    # xDeepFM is run twice: with CIN batch-norm (the reference default) and
    # without. BN's running-statistics dynamics differ between frameworks
    # (both lose val logloss with BN on this dataset); the no-BN pair
    # isolates the CIN/DNN interaction math, where parity holds.
    "config4_dcn_xdeepfm": ["DCN", "xDeepFM", "xDeepFM_noBN"],
}

OUR_SPECS = {
    # our LR mirrors the reference's Linear+Sigmoid (probability outputs),
    # so it trains with BCELoss; the twin emits logits + BCEWithLogits —
    # mathematically the same objective.
    "LR": ("LR", {"schema": "feat_only", "criterion": "BCELoss"}, {}),
    "FM": ("FM", {"schema": "feat_emb"}, {"dropout_rate": 0.0}),
    "FFM": ("FFM", {"schema": "feat_fieldemb"}, {"num_fields": N_FIELDS}),
    "DeepFM": ("DeepFM", {"schema": "feat_emb"}, {"deep_layer_sizes": (64, 64)}),
    "NFM": ("NFM", {"schema": "feat_emb"}, {"deep_layer_sizes": (64, 64)}),
    "DCN": ("DCN", {"schema": "emb_only"}, {
        "cross_num_layers": 2, "deep_output_size": 16, "deep_layer_sizes": (64, 64)}),
    "xDeepFM": ("xDeepFM", {"schema": "feat_emb"}, {
        "embed_size": E, "num_fields": N_FIELDS,
        "cin_layer_sizes": (16, 16), "deep_layer_sizes": (64, 64)}),
    "xDeepFM_noBN": ("xDeepFM", {"schema": "feat_emb"}, {
        "embed_size": E, "num_fields": N_FIELDS, "use_batchnorm": False,
        "cin_layer_sizes": (16, 16), "deep_layer_sizes": (64, 64)}),
}


def build_schema(kind):
    emb = MultiIndicesEmbedding(embed_size=E, field_sizes=FIELD_SIZES, fields=CAT)
    if kind == "feat_only":
        return {"feat_inputs": feat_schema()}
    if kind == "feat_emb":
        return {"feat_inputs": feat_schema(), "emb_inputs": emb}
    if kind == "emb_only":
        return {"emb_inputs": emb}
    if kind == "feat_fieldemb":
        return {
            "feat_inputs": feat_schema(),
            "field_emb_inputs": MultiIndicesFieldAwareEmbedding(
                embed_size=E, field_sizes=FIELD_SIZES, fields=CAT
            ),
        }
    raise KeyError(kind)


def main(only=None):
    data = make_synthetic_ctr(
        num_rows=ROWS, field_sizes=FIELD_SIZES, num_dense=NUM_DENSE, seed=7,
        pair_scale=PAIR_SCALE,
    )
    results = {
        "protocol": {
            "dataset": "make_synthetic_ctr (bundled; no network egress in the "
                       "build environment, see PARITY.md)",
            "oracle": "parity/torch_twin.py (the reference package cannot "
                      "execute on torch 2.13: named tensors removed)",
            "rows": ROWS, "train_rows": TRAIN, "field_sizes": FIELD_SIZES,
            "num_dense": NUM_DENSE, "pair_scale": PAIR_SCALE,
            "embed_size": E, "epochs": EPOCHS,
            "lr": LR, "batch_size": BATCH, "optimizer": "Adam",
            "reference": "p768lwy3/torecsys @ /root/reference (torch, "
                         "unmodified model code, minimal Adam/BCE loop)",
        },
        "configs": {},
    }
    def band(runs, key):
        vals = [r[key] for r in runs]
        return {f"{key}_per_seed": vals,
                f"{key}_mean": round(float(np.mean(vals)), 4),
                f"{key}_band": round(float(np.max(vals) - np.min(vals)), 4)}

    for config, models in CONFIG_MODELS.items():
        for name in models:
            if only and name not in only:
                continue
            reg_name, meta, kwargs = OUR_SPECS[name]
            # >= 3 seeds PER SIDE (r3 VERDICT weak-5): a conclusion like
            # "within run-to-run variance" needs the variance measured, on
            # both sides, not a single-seed +-0.005 eyeball.
            print(f"== {config} / {name}: ours x{N_SEEDS} ...", flush=True)
            our_runs = [run_ours(
                data, reg_name, build_schema(meta["schema"]),
                criterion=meta.get("criterion", "BCEWithLogitsLoss"),
                seed=sd, **kwargs) for sd in range(N_SEEDS)]
            ours = {**band(our_runs, "auc"), **band(our_runs, "logloss")}
            print(f"   ours: {ours}", flush=True)
            print(f"   reference x{N_SEEDS} ...", flush=True)
            their_runs = [run_reference(data, name, seed=sd)
                          for sd in range(N_SEEDS)]
            theirs = {**band(their_runs, "auc"), **band(their_runs, "logloss")}
            print(f"   reference: {theirs}", flush=True)
            joint_band = max(ours["auc_band"], theirs["auc_band"])
            delta = round(ours["auc_mean"] - theirs["auc_mean"], 4)
            results["configs"].setdefault(config, {})[name] = {
                "ours": ours, "reference": theirs,
                "auc_delta_of_means": delta,
                "auc_seed_band_max": round(joint_band, 4),
                "delta_within_band": bool(abs(delta) <= joint_band + 1e-9),
            }
    if not only or "NCF" in (only or []):
        print("== config5 / NCF+BPR ...", flush=True)
        ltr_data, _, _ = make_implicit_data()
        # run-to-run seed spread IS the parity band for this config — report
        # it on BOTH sides (a single our-side seed can sit at the band edge)
        our_seeds = [run_ours_ncf_bpr(ltr_data, seed=sd)["ndcg@10"]
                     for sd in range(4)]
        ours = {"ndcg@10_per_seed": our_seeds,
                "ndcg@10_mean": round(float(np.mean(our_seeds)), 4)}
        print(f"   ours: {ours}", flush=True)
        seeds = [run_reference_ncf_bpr(ltr_data, seed=sd)["ndcg@10"] for sd in range(4)]
        theirs = {"ndcg@10_per_seed": seeds,
                  "ndcg@10_mean": round(float(np.mean(seeds)), 4)}
        print(f"   reference: {theirs}", flush=True)
        results["configs"]["config5_ncf_bpr"] = {
            "NCF_BPR": {"ours": ours, "reference": theirs,
                        "ndcg_delta_vs_mean": round(
                            ours["ndcg@10_mean"] - theirs["ndcg@10_mean"], 4)}
        }
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "PARITY.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    if "--matched-init" in sys.argv:
        matched_init_experiment(
            sys.argv[2] if len(sys.argv) > 2 else "DeepFM")
    else:
        main(only=sys.argv[1].split(",") if len(sys.argv) > 1 else None)
