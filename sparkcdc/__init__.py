"""sparkcdc — a PySpark-native CDC / incremental-ingest engine.

A from-scratch engine with the capabilities of the reference connector
(treasure-data/embulk-input-jira, read-only at /root/reference), generalized
per the north rule into a change-log tailer that applies keyed
insert/update/delete events via partitioned MERGE/upsert into an
Iceberg-style snapshot table ("icebox") of pre-tokenized training sequences:

    (doc_id string, tokens array<int>, n_tok int, source string)

Everything is DataFrame-native: Catalyst expressions for casts / flatten /
dedup / merge, vectorized Arrow/pandas UDFs for the normalization pass —
no per-row Python anywhere.

Module map (see SURVEY.md §7):
    config        job config + validation      (ref JiraInputPlugin.java:57-100)
    changelog     synthetic CDC log + scans    (ref JiraClient.java:67-89 pagination)
    flatten       nested-JSON flatten walker   (ref Issue.java:59-142)
    coerce        try-cast matrix, strftime    (ref util/JiraUtil.java:102-264)
    schema_infer  guess + schema evolution     (ref JiraInputPlugin.java:170-220)
    dedup         salted LWW dedup             (north-rule T2)
    icebox        snapshot-commit table        (north-rule T3; Iceberg-shaped)
    audit         WAP staged-commit quality gates (stage → audit → publish)
    lineage       checkpoint fence             (north-rule T7)
    engine        micro-batch apply loop       (ref JiraInputPlugin.java:139-168)
    streaming     Structured Streaming tailer  (foreachBatch front-end)
    stateful      applyInPandasWithState LWW   (custom stateful operator)
    metrics       structured metrics
    textops       token counts / lang-ID / quality / fingerprints
    dedupe_docs   exact / Jaccard / MinHash-LSH / SimHash near-dup
    sigindex      persistent MinHash index, change-feed maintained;
                  consume_changes (public consumer-window API)
    vecindex      persistent LSH-ANN vector index, change-feed maintained
    aggview       incremental materialized GROUP BY (IVM: retract-and-apply
                  count/sum/avg; min/max monotone + tie-triggered re-agg)
    ann           cosine top-k, multi-band LSH, IVF
    decontam      benchmark n-gram decontamination + NgramIndex
    packing       sequence packing; PackedTable (change-feed maintained),
                  epoch_order, export_training_set
    mix           deterministic mix sampling + train/val split
    bloom         per-file key bloom sidecars
    multimodal    binary payloads + Arrow decode stage
    oracle        single-threaded pandas replay oracle (test-only)
"""

__version__ = "0.1.0"
