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
