"""Pipeline validation rules.

Ports the semantic checks of ``conveyor-etl-dsl/src/validation.rs:9-433``
and the graph checks of ``conveyor-etl-routing/src/dag.rs:234-375``:

- non-empty name, at least one stage;
- unique stage ids (parser enforces), parallelism >= 1;
- pipeline starts at source/fan_in, ends at sink/fan_out;
- fan_in needs >= 2 inputs, fan_out >= 2 outputs (validation.rs:280-286);
- field-mapping exclusivity: a mapping sets exactly one of
  source/expression/literal (validation.rs mapping rules);
- no cycles; every stage on a source→sink path (reachability).
"""

from __future__ import annotations

from etl_router_spark.model.manifest import Pipeline, Stage, StageType

KNOWN_TRANSFORMS = {
    "filter", "map", "project", "rename", "cast", "mask", "validate",
    "flatmap", "split", "dedupe", "ratelimit", "aggregate", "join",
    "sessionize",
    # large-scale data-pipeline extensions (first-class in this engine)
    "dedup_exact", "dedup_minhash", "dedup_simhash", "dedup_embedding",
    "similarity_topk", "text_stats", "langid", "fingerprint", "tokenize",
    "multimodal_extract", "decontaminate", "hash_sample", "pack_sequences",
    "repetition_stats", "pii_redact", "chunk",
    "tfidf", "heavy_hitters", "inverted_index", "group_topk", "global_shuffle",
    "dedup_cluster", "cdc_apply", "split_assign", "unigram_logprob",
    "bigram_logprob", "dedup_index_build", "dedup_index_probe",
    "dedup_ngram", "ngram_counts", "char_entropy", "line_dedup",
    "embedding_normalize", "embedding_quantize", "text_normalize",
    # user-code extension point (proto/transform.proto ProcessBatch)
    "service",
    "mix_sample", "duplicate_spans", "gopher_filter", "c4_filter",
    "url_normalize", "quality_filter", "quality_buckets", "chunk_sentences",
    "bm25", "pagerank", "degree_stats", "triangle_count",
    "edit_distance_pairs", "embedding_mean_pool", "embedding_pca_project",
    "pack_boundaries", "kafka_envelope", "bpe_tokenize",
    "pq_encode", "pq_topk", "quality_classifier",
    "dsir_sample", "weighted_sample", "bloom_decontaminate",
    "retrieval_eval", "leakage_splits", "epoch_upsample", "snapshot_diff",
    "domain_cap", "filter_attribution", "strip_repeated_lines",
    "redact_spans", "yield_curve", "decontaminate_fuzzy",
    "hard_negatives", "bloom_build",
}

KNOWN_SOURCES = {
    "kafka", "kinesis", "pulsar", "rabbitmq", "sqs", "redis", "nats",
    "file", "s3", "gcs", "http", "websocket", "postgres_cdc", "mysql_cdc",
    "mongodb", "grpc", "jdbc", "memory", "rate", "jsonl_queue", "warc",
}


class ValidationError(ValueError):
    pass


# spec.limits — pipeline-level declarative capacity limits (the
# reference's settings.rs pattern: every capacity knob is config).
# Validated at parse/compile time so a typo'd limit fails fast instead
# of silently not guarding anything.
KNOWN_LIMITS = {"max_candidates", "max_df", "salt_cap", "max_postings"}


def validate_pipeline(p: Pipeline) -> None:
    errors: list[str] = []
    if not p.name:
        errors.append("pipeline name must not be empty")
    if not p.stages:
        errors.append("pipeline must have at least one stage")

    for k, v in (p.limits or {}).items():
        if k not in KNOWN_LIMITS:
            errors.append(
                f"unknown limit {k!r} (known: {sorted(KNOWN_LIMITS)})")
        elif not isinstance(v, int) or isinstance(v, bool) or v < 1:
            errors.append(f"limit {k!r} must be a positive integer, got {v!r}")

    for s in p.stages.values():
        errors.extend(_validate_stage(s))

    for e in p.edges:
        if e.from_stage not in p.stages:
            errors.append(f"edge references unknown stage {e.from_stage!r}")
        if e.to_stage not in p.stages:
            errors.append(f"edge references unknown stage {e.to_stage!r}")

    if p.stages and not errors:
        first_types = {s.stage_type for s in p.stages.values() if not p.incoming(s.id)}
        if not first_types & {StageType.SOURCE, StageType.FAN_IN}:
            errors.append("pipeline must start with a source or fan_in stage")
        last_types = {s.stage_type for s in p.stages.values() if not p.outgoing(s.id)}
        if not last_types & {StageType.SINK, StageType.FAN_OUT}:
            errors.append("pipeline must end with a sink or fan_out stage")

        for s in p.stages.values():
            if s.stage_type == StageType.FAN_IN and len(p.incoming(s.id)) < 2:
                errors.append(f"fan_in stage {s.id!r} needs >= 2 inputs")
            if s.stage_type == StageType.FAN_OUT and len(p.outgoing(s.id)) < 2:
                errors.append(f"fan_out stage {s.id!r} needs >= 2 outputs")

        cycle = p.detect_cycle()
        if cycle:
            errors.append(f"pipeline has a cycle: {' -> '.join(cycle)}")
        else:
            dangling = p.unreachable_stages()
            if dangling:
                errors.append(f"stages not on a source->sink path: {sorted(dangling)}")

    if errors:
        raise ValidationError("; ".join(errors))


def _validate_stage(s: Stage) -> list[str]:
    errors: list[str] = []
    if s.parallelism < 1:
        errors.append(f"stage {s.id!r}: parallelism must be >= 1")
    if s.stage_type == StageType.TRANSFORM:
        tt = s.transform_type
        if tt not in KNOWN_TRANSFORMS:
            errors.append(f"stage {s.id!r}: unknown transform_type {tt!r}")
    if s.stage_type == StageType.SOURCE:
        st = s.source_type
        if st not in KNOWN_SOURCES:
            errors.append(f"stage {s.id!r}: unknown source_type {st!r}")
    for m in s.config.get("mappings", []) or []:
        set_fields = [k for k in ("source", "source_field", "expression", "literal") if m.get(k) is not None]
        if len(set_fields) > 1:
            errors.append(
                f"stage {s.id!r}: mapping for {m.get('target')!r} sets {set_fields}; "
                "exactly one of source/expression/literal allowed"
            )
    return errors
