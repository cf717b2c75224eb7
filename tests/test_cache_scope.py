"""plans.cache pin scoping (r13, ADVICE): a foreachBatch body that
releases its per-batch pins must not drain pins belonging to another
pipeline running in the same driver. pin_scope() captures this
thread's pins and releases exactly those; release_pinned() keeps its
global-registry semantics and never sees scoped pins."""

from crysda_spark.plans.cache import (pin, pin_scope, pinned_count,
                                      release_pinned)


def test_pin_scope_releases_only_its_own_pins(spark):
    release_pinned()
    outside = pin(spark.range(5))          # another pipeline's pin
    assert outside.is_cached and pinned_count() == 1
    with pin_scope() as scope:
        inner = pin(spark.range(7))
        assert inner.is_cached
        assert scope == [inner]
        # scoped pins are invisible to the global registry/release
        assert pinned_count() == 1
        assert release_pinned() == 1       # drains ONLY the global pin
        assert not outside.is_cached
        assert inner.is_cached
    assert not inner.is_cached             # scope exit unpersisted it
    assert pinned_count() == 0


def test_pin_scope_nests_and_survives_exceptions(spark):
    release_pinned()
    with pin_scope():
        a = pin(spark.range(3))
        try:
            with pin_scope():
                b = pin(spark.range(4))
                raise RuntimeError("batch failed")
        except RuntimeError:
            pass
        # inner scope released on failure; outer scope untouched
        assert not b.is_cached
        assert a.is_cached
    assert not a.is_cached
    # after all scopes exit, pin() routes to the global registry again
    c = pin(spark.range(2))
    assert pinned_count() == 1
    release_pinned()
    assert not c.is_cached


def test_decontam_index_already_cached_is_not_repinned(spark):
    # amortized-index contract: an is_cached index is used as-is, so
    # per-batch calls neither re-pin nor re-persist the shared copy
    from crysda_spark.frame import Frame
    from crysda_spark.pipeline.dupspan import (
        build_decontam_index, decontaminate_spans_with_index)
    release_pinned()
    bench = Frame(spark.createDataFrame(
        [(1, "shared benchmark window 0123456789")],
        "doc_id long, text string"))
    train = Frame(spark.createDataFrame(
        [(2, "train doc leaking 0123456789 chars")],
        "doc_id long, text string"))
    idx = Frame(pin(build_decontam_index(bench, "text", "doc_id",
                                         min_len=10).sdf))
    assert pinned_count() == 1
    with pin_scope() as scope:
        spans = decontaminate_spans_with_index(
            train, idx, "text", "doc_id", min_len=10, probe=False)
        assert spans.sdf.count() >= 0
        assert idx.sdf not in scope        # not captured by the batch
    assert idx.sdf.is_cached               # survives the batch scope
    assert pinned_count() == 1
    release_pinned()
