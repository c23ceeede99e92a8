"""Profiler span tree, aggregation, and report rendering."""

from triton_vm_tpu.utils import profiler


def test_noop_without_session():
    with profiler.span("outside"):
        pass
    prof = profiler.finish()
    assert prof.tasks == []


def test_span_tree_and_categories():
    profiler.start("unit")
    with profiler.span("a", category="cat1"):
        with profiler.span("b", category="cat2"):
            pass
        for _ in range(3):
            with profiler.span("c", category="cat2"):
                pass
    with profiler.span("d"):
        pass
    prof = profiler.finish()

    names = [t.name for t in prof.tasks]
    assert names == ["a", "b", "c", "d"]
    by_name = {t.name: t for t in prof.tasks}
    assert by_name["b"].parent == 0 and by_name["c"].parent == 0
    assert by_name["a"].parent is None and by_name["d"].parent is None
    assert by_name["c"].num_invocations == 3
    assert set(prof.category_times) == {"cat1", "cat2"}

    report = str(prof.with_cycle_count(1000).with_padded_height(1024))
    assert "### unit" in report
    assert "c (3x)" in report
    assert "cycles: 1000" in report
    assert "padded height: 1024" in report
    # tree drawing: b and c are children of a, d is a root sibling
    assert any(line.startswith("├─b") for line in report.splitlines())
    assert any(line.startswith("└─c") for line in report.splitlines())


def test_unfinished_spans_are_closed():
    profiler.start("unit")
    profiler.enter("left-open")
    prof = profiler.finish()
    assert prof.tasks[0].name == "left-open (unfinished)"


def test_prover_stage_markers_populate_profile():
    from triton_vm_tpu.stark import prover as prover_mod

    profiler.start("stages")
    prover_mod._trace("stage one", "catA")
    prover_mod._trace("stage two", "catB")
    prover_mod._trace(None)
    prof = profiler.finish()
    assert [t.name for t in prof.tasks] == ["stage one", "stage two"]
    assert prof.tasks[0].category == "catA"
