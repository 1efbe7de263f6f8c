"""Like-for-like 1M/4M A/B of the contamination screen (SCALING.md r12).

VERDICT r11 task 5: the in-DAG ``contaminated`` stage's 1M->4M exponent
(1.44) was the one parenthesized figure left unadjudicated by a
single-session A/B -- SCALING.md called it an absolute-scale artifact
(2.4s base), but the 4M wall also includes the ratio-cap's larger
surviving index. This tool runs BOTH sizes in ONE session over
persisted shingle indexes, timing only the screen itself
(``dedup.contaminated_docs``: bench-side broadcast + one sid equi-join
+ pair-count aggregate), index build excluded:

    python tools/contam_ab.py <corpus_dir_1m> <corpus_dir_4m>

Protocol matches the r11 span_deduped re-measurement: same session,
inputs materialized first, each screen timed over a cached index, the
smaller size first (so warmup, if any, biases AGAINST the small base --
conservative for the exponent).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from tools.dfcap_sweep import make_session

    dirs = sys.argv[1:3]
    assert len(dirs) == 2, "usage: contam_ab.py <dir_1m> <dir_4m>"
    spark = make_session()

    from data_pipeline_spark_iceberg_dbt_airflow_spark.queries.dedup import (
        contaminated_docs,
        release_shingle_index,
        shingled_docs,
    )

    out = {"runs": []}
    walls = []
    for sf_dir in dirs:
        sh = shingled_docs(spark, sf_dir)
        n_index = sh.count()  # builds + pins the index; excluded from the wall
        t0 = time.time()
        n_pairs = contaminated_docs(sh).count()
        wall = round(time.time() - t0, 2)
        walls.append(wall)
        out["runs"].append(
            {
                "dir": sf_dir,
                "index_rows": n_index,
                "contaminated_pairs": n_pairs,
                "screen_s": wall,
            }
        )
        release_shingle_index(spark)
    ratio = walls[1] / walls[0] if walls[0] else None
    out["ratio"] = round(ratio, 2) if ratio else None
    out["exponent"] = round(math.log(ratio, 4), 2) if ratio else None
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
