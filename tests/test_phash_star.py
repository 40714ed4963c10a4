"""media_phash_star must be CONNECTIVITY-equivalent to the clique form
(media_phash_pairs): same connected components over the same doc set,
with edge count linear (not quadratic) in exact-duplicate cluster size.
This is the sf10-soak fix: the clique form emitted 407M pairs / 90 GB
spill at 100-way duplication; the star form removes exactly that term."""

from __future__ import annotations


def _components(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    return frozenset(frozenset(n for n in nodes if find(n) == r)
                     for r in {find(n) for n in nodes})


def test_star_components_equal_clique_components(spark):
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    clique = [(r.id_a, r.id_b) for r in
              E.queries()["media_phash_pairs"](spark, sf).collect()]
    star_rows = E.queries()["media_phash_star"](spark, sf).collect()
    star = [(r.id_a, r.id_b) for r in star_rows]
    nodes = {n for e in clique for n in e} | {n for e in star for n in e}
    assert _components(clique, nodes) == _components(star, nodes)

    # the whole point: star edge count is bounded by clique's, and the
    # exact-dup portion is linear (one edge per non-representative)
    assert len(star) <= len(clique)
    n_exact = sum(1 for r in star_rows if r.kind == "exact")
    n_near = sum(1 for r in star_rows if r.kind == "near")
    assert n_exact + n_near == len(star)
    # every near edge is rep-to-rep with 1 <= hamming <= 8
    assert all(1 <= r.hamming <= 8 for r in star_rows
               if r.kind == "near")
    assert all(r.hamming == 0 for r in star_rows if r.kind == "exact")


def test_minhash_star_components_equal_clique_components(spark):
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    clique = [(r.doc_a, r.doc_b) for r in
              E.queries()["dedup_minhash_lsh"](spark, sf).collect()]
    star_rows = E.queries()["dedup_minhash_star"](spark, sf).collect()
    star = [(r.doc_a, r.doc_b) for r in star_rows]
    nodes = {n for e in clique for n in e} | {n for e in star for n in e}
    assert _components(clique, nodes) == _components(star, nodes)
    assert len(star) <= len(clique)
    assert all(r.est_jaccard == 1.0 for r in star_rows
               if r.kind == "exact")
    assert all(r.est_jaccard >= 0.5 for r in star_rows
               if r.kind == "near")


def test_simhash_star_components_equal_clique_components(spark):
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    clique = [(r.doc_a, r.doc_b) for r in
              E.queries()["dedup_simhash64"](spark, sf).collect()]
    star_rows = E.queries()["dedup_simhash_star"](spark, sf).collect()
    star = [(r.doc_a, r.doc_b) for r in star_rows]
    nodes = {n for e in clique for n in e} | {n for e in star for n in e}
    assert _components(clique, nodes) == _components(star, nodes)
    assert len(star) <= len(clique)
    assert all(r.hamming == 0 for r in star_rows if r.kind == "exact")
    assert all(1 <= r.hamming <= 8 for r in star_rows
               if r.kind == "near")
