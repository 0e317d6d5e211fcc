"""The canonical quickstart job, ported line-for-line to this engine.

Flink original shape [PK]::

    env = StreamExecutionEnvironment.getExecutionEnvironment()
    env.readTextFile(path).flatMap(Tokenizer()).keyBy(0).sum(1).print()
    env.execute("word count")

Run: ``python examples/word_count_job.py [sf_dir]``
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from flink_quickstart_spark.api import StreamExecutionEnvironment


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    env = StreamExecutionEnvironment.get_execution_environment()

    (
        env.read_table("documents", sf_dir)
        .flat_map(F.split(F.lower("text"), r"\s+"), "word")
        .filter(F.length("word") > 0)
        .key_by("word")
        .count()
        .to_df()
        .orderBy(F.col("count").desc(), "word")
        .show(20, truncate=False)
    )
    env.execute("word count")


if __name__ == "__main__":
    main()
