"""Batch-142 tests: energy distance, Markov accuracy, rec coverage —
python oracles + null/no-leakage/diversity properties."""

import json
import math
from collections import Counter, defaultdict


def test_energy_distance_python_oracle_and_null(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext147 import (
        _ED_SCALE,
        q_energy_distance,
    )

    [r] = q_energy_distance(spark, sf_dir).collect()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    vecs = {e.vec_id: [float(x) for x in e.embedding] for e in emb}
    ids = sorted(vecs)
    sums, cnt = Counter(), Counter()
    for i_idx, i in enumerate(ids):
        for j in ids[i_idx + 1 :]:
            d = math.sqrt(
                sum((a - b) ** 2 for a, b in zip(vecs[i], vecs[j]))
            )
            key = (
                "xx" if i % 2 == 0 and j % 2 == 0
                else "yy" if i % 2 == 1 and j % 2 == 1 else "xy"
            )
            sums[key] += round(d * _ED_SCALE)
            cnt[key] += 1
    ed = (
        2 * sums["xy"] / (_ED_SCALE * cnt["xy"])
        - sums["xx"] / (_ED_SCALE * cnt["xx"])
        - sums["yy"] / (_ED_SCALE * cnt["yy"])
    )
    assert r.n_cross_pairs == cnt["xy"]
    assert abs(r.energy_distance - round(ed, 8)) < 1e-9
    # null calibration on the parity split of iid vectors
    assert abs(r.energy_distance) < 0.05


def test_markov_accuracy_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext147 import (
        q_markov_accuracy,
    )
    from arrow_supercluster_spark.sources.tables import read_events

    [r] = q_markov_accuracy(spark, sf_dir).collect()
    ev = read_events(spark, sf_dir).collect()
    seqs = defaultdict(list)
    for e in ev:
        seqs[e.user_id].append((e.ts, e.event_id, e.event_type))
    train_c = defaultdict(Counter)
    train_marg = Counter()
    test_pairs = []
    for u, rows in seqs.items():
        rows.sort()
        for (_, _, cur), (_, _, nxt) in zip(rows, rows[1:]):
            if u % 2 == 1:
                train_c[cur][nxt] += 1
                train_marg[nxt] += 1
            else:
                test_pairs.append((cur, nxt))
    model = {
        cur: sorted(cnts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        for cur, cnts in train_c.items()
    }
    maj = sorted(train_marg.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
    scored = [(c, n) for c, n in test_pairs if c in model]
    acc = sum(1 for c, n in scored if model[c] == n) / len(scored)
    macc = sum(1 for _, n in scored if n == maj) / len(scored)
    assert r.n_test == len(scored)
    assert abs(r.markov_accuracy - round(acc, 6)) < 1e-9
    assert abs(r.majority_accuracy - round(macc, 6)) < 1e-9
    # with 5 event types, any real model beats 1/5 chance...
    assert r.majority_accuracy > 0.1


def test_rec_coverage_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext147 import (
        q_rec_coverage,
    )

    [r] = q_rec_coverage(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    ui = Counter()
    for e in ev:
        if e.event_type == "click":
            ui[(e.user_id, json.loads(e.props)["k"] % 100)] += 1
    users_of = defaultdict(dict)
    items_of = defaultdict(set)
    for (u, i), c in ui.items():
        users_of[i][u] = c
        items_of[u].add(i)
    n2 = {i: sum(c * c for c in users_of[i].values()) for i in users_of}
    sims = defaultdict(dict)
    for i in users_of:
        for j in users_of:
            if i == j:
                continue
            num = sum(
                c * users_of[j][u]
                for u, c in users_of[i].items()
                if u in users_of[j]
            )
            if num:
                sims[i][j] = round(
                    num / (math.sqrt(n2[i]) * math.sqrt(n2[j])) * 1e9
                )
    topn = {
        i: [j for j, _ in sorted(js.items(), key=lambda kv: (-kv[1], kv[0]))[:3]]
        for i, js in sims.items()
    }
    recs = set()
    for u, items in items_of.items():
        for i in items:
            for j in topn.get(i, ()):
                if j not in items:
                    recs.add((u, j))
    per_item = Counter(j for _, j in recs)
    catalog = len(users_of)
    n_rec = len(per_item)
    k_top = math.ceil(n_rec * 0.1)
    ranked = sorted(per_item.items(), key=lambda kv: (-kv[1], kv[0]))
    top_share = sum(v for _, v in ranked[:k_top]) / sum(per_item.values())
    assert r.n_items == catalog
    assert r.items_recommended == n_rec
    assert abs(r.catalog_coverage - round(n_rec / catalog, 4)) < 1e-9
    assert abs(r.top_decile_share - round(top_share, 4)) < 1e-9
    assert 0 < r.catalog_coverage <= 1
    assert r.top_decile_share >= 0.1 - 1e-9  # decile holds >= its share
