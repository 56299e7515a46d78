import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


@pytest.fixture(scope="session")
def spark():
    from ocr_engine_spark.session import build_session

    s = build_session(
        app_name="tests",
        master="local[2]",
        shuffle_partitions=8,
        # tiny Arrow batches force multi-batch mapInArrow paths
        arrow_batch=16,
        extra={"spark.driver.memory": "4g", "spark.sql.session.timeZone": "UTC"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_transcripts(spark, tmp_path_factory):
    """The fixture-tier synthetic transcripts, written to parquet."""
    from ocr_engine_spark.sources.synth import gen_transcripts
    from ocr_engine_spark.sources.tableio import write_transcripts_parquet

    path = str(tmp_path_factory.mktemp("transcripts") / "tiny")
    write_transcripts_parquet(
        spark, gen_transcripts(n_convs=40, seed=42, mega=1, mega_turns=120), path
    )
    return path
