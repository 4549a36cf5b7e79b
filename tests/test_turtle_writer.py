"""Distributed observation-block rendering == driver-side blocks."""


def test_distributed_observation_blocks_match_driver(spark, engine_inputs):
    from edgar_finance_ontology_spark.emit.csv_format import (
        observations_csv_frame,
    )
    from edgar_finance_ontology_spark.emit.turtle import observation_block
    from edgar_finance_ontology_spark.emit.turtle_writer import (
        observation_lines_df,
    )
    from edgar_finance_ontology_spark.operators.observations import (
        build_observations,
    )

    facts, companies = engine_inputs
    obs = observations_csv_frame(
        build_observations(facts, companies, fy=2024)
    )
    dist = {
        (r["cik"], r["metric"]): r["block"]
        for r in observation_lines_df(obs, {}).collect()
    }
    seen = {"units": set(), "currencies": set(), "concepts": {},
            "sectors": set(), "industries": set(), "industry_sector": {}}
    for rec in obs.toPandas().to_dict("records"):
        want = "\n".join(observation_block(rec, seen))
        assert dist[(rec["cik"], rec["metric"])] == want


def test_full_document_distributed_concat_byte_identical(
    spark, panel_dir, engine_inputs, tmp_path
):
    """EVERY unbounded family rendered in executors; concatenating the
    ordered pieces reproduces the golden Turtle byte-for-byte (which is
    itself byte-identical to the reference output on this panel)."""
    from edgar_finance_ontology_spark.emit.turtle_writer import (
        concat_turtle_parts, write_turtle_document,
    )
    from edgar_finance_ontology_spark.plans.pipeline import (
        golden_turtle, run_pipeline,
    )

    facts, companies = engine_inputs
    t = run_pipeline(facts, companies, fy=2024)
    out = str(tmp_path / "ttl_parts")
    write_turtle_document(
        out, companies, t["observations"], t["benchmarks"], t["rankings"]
    )
    got = concat_turtle_parts(out)
    want = golden_turtle(facts, companies, fy=2024)
    if got != want:
        gl, wl = got.splitlines(), want.splitlines()
        for i, (a, b) in enumerate(zip(gl, wl)):
            assert a == b, f"line {i}:\ngot : {a!r}\nwant: {b!r}"
        assert len(gl) == len(wl), (len(gl), len(wl), gl[-3:], wl[-3:])
    assert got == want
    # and therefore byte-identical to the reference's own emission
    ref = (panel_dir["dir"] / "instances.ttl").read_text()
    assert got == ref
