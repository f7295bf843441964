"""Batch-167 tests: python replays of the character/line hygiene
operators over the same deterministic dirty fixtures."""

import math
import re


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").collect()


def test_script_mix_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext172 import q_script_mix

    got = {
        r.lang: (
            r.n_docs, r.total_chars, r.alpha_frac, r.digit_frac,
            r.space_frac, r.punct_frac,
        )
        for r in q_script_mix(spark, sf_dir).collect()
    }
    agg = {}
    for d in _docs(spark, sf_dir):
        tail = {0: "!!", 1: ", ok.", 2: " (x)", 3: ""}[d.doc_id % 4]
        t = f"{d.text} {d.doc_id % 100}{tail}"
        e = agg.setdefault(d.lang, [0, 0, 0, 0, 0])
        e[0] += 1
        e[1] += len(t)
        e[2] += sum(c.isalpha() for c in t)
        e[3] += sum(c.isdigit() for c in t)
        e[4] += sum(c == " " for c in t)
    want = {
        lang: (
            n, tot,
            round(a / tot, 6), round(dg / tot, 6), round(sp / tot, 6),
            round((tot - a - dg - sp) / tot, 6),
        )
        for lang, (n, tot, a, dg, sp) in agg.items()
    }
    assert got == want
    # the augmentation makes every class non-trivial
    assert all(v[3] > 0 for v in got.values())  # digits present


def test_mojibake_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext172 import (
        _MJ_APOS,
        _MJ_BOM,
        _MJ_EACUTE,
        _MJ_REPL,
        q_mojibake,
    )

    got = {
        r.source: (r.n_docs, r.n_replacement, r.n_cp1252, r.damage_rate)
        for r in q_mojibake(spark, sf_dir).collect()
    }
    agg = {}
    for d in _docs(spark, sf_dir):
        tail = {
            0: " it" + _MJ_APOS + "s",
            1: " " + _MJ_EACUTE + "t" + _MJ_EACUTE,
            2: " " + _MJ_REPL,
            3: " " + _MJ_BOM + "start",
        }.get(d.doc_id % 7, "")
        t = d.text + tail
        repl = _MJ_REPL in t
        cp = _MJ_APOS[:2] in t or _MJ_EACUTE in t or _MJ_BOM in t
        e = agg.setdefault(d.source, [0, 0, 0, 0])
        e[0] += 1
        e[1] += repl
        e[2] += cp
        e[3] += repl or cp
    want = {
        s: (n, r, c, round(dmg / n, 6)) for s, (n, r, c, dmg) in agg.items()
    }
    assert got == want
    # ~4/7 of docs are damaged by construction
    total = sum(v[0] for v in got.values())
    damaged = sum(v[1] + v[2] for v in got.values())
    assert 0.4 < damaged / total < 0.7


def test_line_filters_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext172 import (
        _LF_BUDGET,
        _LF_WORDS,
        q_line_filters,
    )

    got = {
        r.source: (
            r.n_docs, r.total_lines, r.flagged_lines,
            r.avg_flagged_frac, r.n_kept,
        )
        for r in q_line_filters(spark, sf_dir).collect()
    }

    def flag(line):
        return (
            line.startswith("-")
            or line.endswith("...")
            or (line.upper() == line and re.search("[A-Z]", line))
            or len(line.split(" ")) < 3
        )

    agg = {}
    for d in _docs(spark, sf_dir):
        toks = d.text.split(" ")
        lines = [
            " ".join(toks[i * _LF_WORDS:(i + 1) * _LF_WORDS])
            for i in range(math.ceil(len(toks) / _LF_WORDS))
        ]
        inj = {
            0: "- click here", 1: "read more...",
            2: "SUBSCRIBE NOW", 3: "ok",
        }.get(d.doc_id % 5)
        if inj is not None:
            lines.append(inj)
        n_flag = sum(1 for line in lines if flag(line))
        e = agg.setdefault(d.source, [0, 0, 0, 0.0, 0])
        e[0] += 1
        e[1] += len(lines)
        e[2] += n_flag
        e[3] += n_flag / len(lines)
        e[4] += n_flag / len(lines) <= _LF_BUDGET
    want = {
        s: (n, tl, fl, round(fr / n, 6), kept)
        for s, (n, tl, fl, fr, kept) in agg.items()
    }
    assert got == want
    # the injected noise lines actually fire the rules
    assert sum(v[2] for v in got.values()) > 0
    # but clean bodies keep most docs
    assert sum(v[4] for v in got.values()) > 0
