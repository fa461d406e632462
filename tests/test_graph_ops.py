

def test_ktruss_hand_checkable_geometry(spark):
    """Two 4-cliques sharing a vertex plus a star hub: the 4-truss
    (support >= 2) keeps exactly the cliques' 12 edges with support 2
    each and peels every star edge — the k-core CANNOT make this
    distinction (the hub's degree alone survives a 4-core peel on a
    denser star). The 5-truss of a 4-clique is empty (support 2 < 3),
    peeling cascades to nothing."""
    from os_ex_3_map_reduce_spark.operators.graph import ktruss

    clique1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    clique2 = [
        (a, b) for a in (3, 10, 11, 12) for b in (3, 10, 11, 12) if a < b
    ]
    star = [(20, x) for x in range(21, 29)]
    edges = spark.createDataFrame(
        clique1 + clique2 + star, "u long, v long"
    )
    t4 = ktruss(edges, k=4, max_rounds=6)
    got = {(r.u, r.v): r.support for r in t4.collect()}
    assert set(got) == set(clique1) | set(clique2)
    assert all(s == 2 for s in got.values())

    t5 = ktruss(edges, k=5, max_rounds=6)
    assert t5.count() == 0
