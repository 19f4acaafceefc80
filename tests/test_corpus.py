"""Corpus generator + golden oracle invariants (FIXTURES.md F1/F2/F5)."""

from __future__ import annotations

from cognee_spark.functions.similarity import (
    is_alias_pair,
    lsh_band_keys,
    match_key,
    name_similarity,
)
from cognee_spark.sources.corpus import build_repos_df, file_spec, nl_variant, render
from cognee_spark.sources.golden import (
    cluster_aliases,
    corpus_specs,
    golden_nl_triples,
    golden_triples,
    resolve_code_triples,
)

N = 210


def test_spec_determinism_and_shape():
    specs = corpus_specs(N)
    assert len(specs) == N
    for i in (0, 7, 99, N - 1):
        again = file_spec(i, N)
        assert render(specs[i]) == render(again)
        assert (again.repo, again.path, again.lang) == (specs[i].repo, specs[i].path, specs[i].lang)
    # all 5 langs present, repo skew exists
    assert {s.lang for s in specs} == {"python", "go", "js", "java", "md"}
    sizes = {}
    for s in specs:
        sizes[s.repo] = sizes.get(s.repo, 0) + 1
    assert max(sizes.values()) / N > 0.25  # mega-repo skew


def test_alias_variants_cluster_and_strangers_do_not():
    for idx in (0, 7, 23, 47):
        variants = {nl_variant(idx, v) for v in range(5)}
        mapping = cluster_aliases(variants)
        assert len(set(mapping.values())) == 1, mapping
    # AlphaService vs AlphaStore must stay distinct
    assert not is_alias_pair(match_key("AlphaService"), match_key("AlphaStore"))
    mapping = cluster_aliases({"AlphaService", "AlphaStore", "Alpha Service"})
    assert mapping["AlphaService"] == mapping["Alpha Service"]
    assert mapping["AlphaStore"] != mapping["AlphaService"]


def test_global_clustering_recovers_true_entities():
    """All 240 surface forms must cluster into exactly the 48 true entities."""
    truth: dict[str, int] = {}
    names: set[str] = set()
    for i in range(48):
        for v in range(5):
            name = nl_variant(i, v)
            names.add(name)
            truth[name] = i
    mapping = cluster_aliases(names)
    # same true entity → same canonical; different true entity → different
    canon_by_entity: dict[int, set[str]] = {}
    for name, canon in mapping.items():
        canon_by_entity.setdefault(truth[name], set()).add(canon)
    assert all(len(c) == 1 for c in canon_by_entity.values()), {
        k: v for k, v in canon_by_entity.items() if len(v) > 1
    }
    assert len({next(iter(c)) for c in canon_by_entity.values()}) == 48


def test_lsh_recalls_true_typo_pairs():
    """The typo variant must share >=1 LSH band with its canonical form."""
    missed = []
    for i in range(48):
        a, b = match_key(nl_variant(i, 0)), match_key(nl_variant(i, 4))
        bands_a, bands_b = set(lsh_band_keys(a)), set(lsh_band_keys(b))
        if name_similarity(a, b) >= 0.8 and not (bands_a & bands_b):
            missed.append((a, b))
    assert not missed, missed


def test_golden_triples_nonempty_and_normalized():
    triples = golden_triples(N)
    assert len(triples) > 500
    for s, p, o in triples:
        assert s == s.lower() and o == o.lower() and p == p.lower()
        assert " " not in s and " " not in p


def test_ambiguous_helper_skipped():
    specs = corpus_specs(N)
    mega = max({s.repo for s in specs}, key=lambda r: sum(1 for s in specs if s.repo == r))
    triples = resolve_code_triples(specs)
    helper_calls = [t for t in triples if t[1] == "calls" and t[2].endswith(".helper")]
    # no resolved helper call may point into the mega-repo (multiple definitions)
    assert all(not t[0].startswith(match_key_prefix(mega)) for t in helper_calls)


def match_key_prefix(repo: str) -> str:
    from cognee_spark.functions.ids import normalize_identity_py

    return normalize_identity_py(repo + ":")


def test_build_repos_df_distributed_matches_local(spark):
    df = build_repos_df(spark, 60, partitions=4)
    rows = {(r.repo, r.path): r for r in df.collect()}
    assert len(rows) == 60
    for i in (0, 13, 59):
        spec = file_spec(i, 60)
        row = rows[(spec.repo, spec.path)]
        assert row.content == render(spec)
        assert row.lang == spec.lang
        assert len(row.commit) == 40
