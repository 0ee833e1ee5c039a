"""Training-data curation, end to end — the LLM-pipeline operators
composed the way a 100 TB run would chain them (each stage is also a
registered, oracle-checked query; this script wires them together over
the shared test corpus):

  1. quality + language profiling        functions/text.py
  2. PII scrubbing with residual audit   text_pii_scrub
  3. exact + cross-corpus dedup          operators/dedup.py, dedup_cross_corpus
  4. boilerplate + near-dup removal      text_boilerplate_ngrams,
                                         operators/semdedup.py
  5. mixture-weighted sampling           functions/mixing.py
  6. sequence packing to a token budget  text_sequence_packing
  7. multimodal sidecars                 PNG + WAV decode stats
  8. retrieval QA spot-check             text_bm25_topk

Run:  python examples/curation_pipeline.py  [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    from minio_iceberg_polaris_lakehouse_spark.registry import all_queries
    from minio_iceberg_polaris_lakehouse_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="curation-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    stages = [
        ("1. language profile", "text_lang_profile"),
        ("2. quality scores", "text_quality_score"),
        ("3. PII scrub (residual_pii must be 0)", "text_pii_scrub"),
        ("4. exact dedup", "dedup_exact_stats"),
        ("5. cross-corpus decontamination", "dedup_cross_corpus"),
        ("6. boilerplate share by source", "text_boilerplate_ngrams"),
        ("7. semantic dedup (embedding clusters)", "dedup_semantic"),
        ("8. mixture sample (per-source permille)", "text_mixture_sample"),
        ("9. sequence packing", "text_sequence_packing"),
        ("10. image sidecar stats", "mm_blob_stats"),
        ("11. audio sidecar stats", "mm_audio_stats"),
        ("12. retrieval spot-check (BM25 top-k)", "text_bm25_topk"),
    ]
    for title, name in stages:
        print(f"\n== {title} ({name}) ==")
        queries[name].spark(spark, sf_dir).show(5, truncate=False)

    print("\nEvery stage above is hash-verified against a DuckDB oracle "
          "(tests/test_oracle_parity.py); the driver checks the same "
          "comparison per round.")
    spark.stop()


if __name__ == "__main__":
    main()
