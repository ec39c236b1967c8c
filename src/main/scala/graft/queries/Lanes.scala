package graft.queries

/** Bench lane classification: BUILD workloads construct or mutate
  * persistent state inside their timed body (store lifecycle
  * commits, index builds, compactions, codebook training) — their
  * cost grows with the declared lifecycle surface, not with serving
  * efficiency. SERVE workloads read/query. The bench reports the two
  * subtotals beside the suite total so lifecycle-surface growth is
  * legible instead of silently eroding the suite-total-vs-baseline
  * contract (the r15 verdict's reporting ask).
  *
  * Membership is enforced, not hoped for: `LanesSpec` greps the
  * query sources and fails if any QueryDef whose body forces a
  * rebuild (`StoreCache.rebuild`) is missing here.
  */
object Lanes {

  /** Queries whose timed body performs build work. Two sources:
    * every `StoreCache.rebuild`-forcing gate (mechanically checked),
    * plus the iterative-training gates that build codebooks/cells.
    */
  val build: Set[String] = Set(
    // StoreCache.rebuild-forcing gates (mechanical membership)
    "q239_bm25_index_build", "q240_winnow_index_build",
    "q308_panel_rank_build", "q310_winnow_delta_build",
    "q312_winnow_compaction", "q314_edge_stores_build",
    "q315_dupspan_store_build", "q331_store_merge",
    "q333_idempotent_replay", "q334_incremental_view",
    "q335_store_range_read", "q336_erase_rows",
    "q337_dbt_incremental_append", "q338_dbt_incremental_merge",
    "q339_schema_evolution", "q340_constrained_ingest",
    "q341_training_manifest", "q342_join_view_ivm",
    "q343_cdc_replication", "q345_snapshot_join",
    "q349_string_zone_read", "q350_deletion_vector",
    "q351_checkpoint_cold_read", "q352_vacuum_by_age",
    "q353_store_restore", "q354_clustered_compaction",
    "q355_shallow_clone", "q356_bloom_point_read",
    "q357_zorder_compaction", "q358_log_only_stats",
    "q359_cdc_update_images", "q360_rename_evolution",
    "q361_drop_evolution", "q362_sql_dml",
    "q364_sql_merge_general", "q365_partitioned_catalog",
    "q366_retype_widening", "q367_replace_partition",
    // training gates (hand-tagged: Lloyd iterations ARE the cost)
    "q309_pq_trained_recall", "q317_ivf_trained_cells",
    "q319_heldout_trained_cells", "q348_heldout_trained_pq")

  def laneOf(name: String): String =
    if (build(name)) "build" else "serve"
}
