"""Cross-modal dedup semantics: the union graph must merge every
pair either modality found, the keep table must be at least as
coarse as each single-modality clustering, and the edge accounting
must reconcile exactly with the two edge lists."""

from great_expectations_spark import suite_queries as sq

SF = "/root/testdata/sf0.001"


def test_crossmodal_clusters_merge_every_edge(spark):
    cm = {
        r.doc_id: r.cluster_id
        for r in sq.crossmodal_dedup_clusters(spark, SF).collect()
    }
    tx = sq.lsh_verified_pairs(spark, SF).collect()
    ph = sq.phash_hamming_neardup(spark, SF).collect()
    assert tx and ph, "corpus must exercise both modalities"
    for r in tx + ph:
        assert cm[r.doc_a] == cm[r.doc_b], (r.doc_a, r.doc_b)


def test_crossmodal_at_least_as_coarse_as_image_only(spark):
    cm = sq.crossmodal_dedup_clusters(spark, SF).collect()
    img = sq.phash_clusters(spark, SF).collect()
    cm_keep = sum(1 for r in cm if r.keep)
    img_keep = sum(1 for r in img if r.keep)
    # adding text edges can only merge clusters, never split them
    assert cm_keep <= img_keep
    # same image-cluster docs stay together in the union graph
    img_cid = {r.doc_id: r.cluster_id for r in img}
    cm_cid = {r.doc_id: r.cluster_id for r in cm}
    by_img: dict = {}
    for d, c in img_cid.items():
        by_img.setdefault(c, []).append(d)
    for members in by_img.values():
        assert len({cm_cid[d] for d in members}) == 1


def test_edge_stats_reconcile_with_edge_lists(spark):
    st = sq.crossmodal_edge_stats(spark, SF).collect()[0]
    tx = {
        (r.doc_a, r.doc_b)
        for r in sq.lsh_verified_pairs(spark, SF).collect()
    }
    ph = {
        (r.doc_a, r.doc_b)
        for r in sq.phash_hamming_neardup(spark, SF).collect()
    }
    assert st.both_modalities == len(tx & ph)
    assert st.text_only == len(tx - ph)
    assert st.image_only == len(ph - tx)
