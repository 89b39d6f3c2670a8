#!/bin/bash
# Follow-up to run_sf10_sweep2.sh: wait for the sweep shell to exit,
# then (1) re-run batch b3 — its 43 queries all died in ~1s each with
# DuckDB std::bad_alloc because the presnapshot pytest gate's Spark JVM
# was co-scheduled with the sweep's 48g JVM at 22:40 (system memory,
# not the harness: fresh-connection-per-query was already in place and
# batch b4 runs clean solo) — and (2) refresh SCALE_sf10.json with the
# relational/window decade now that gen_sf1 --sf 10 produced all tables.
# Strictly sequential: co-scheduling two heavy JVMs is exactly what
# killed b3.
set -u
cd /root/repo
SWEEP_PID="${1:?usage: run_sf10_followup.sh <sweep_shell_pid>}"
while kill -0 "$SWEEP_PID" 2>/dev/null; do sleep 20; done
echo "=== sweep exited; starting b3r $(date +%H:%M:%S) ===" >> /tmp/sf10_sweep.log
export SPARK_GRAFT_DRIVER_MEM=48g
B3R="dedup_prefix_filter_jaccard,dedup_simhash,embedding_drift_report,embedding_label_cohesion,embedding_quantize_int8_report,export_shard_manifest,heavy_hitters_cms,hotdog_route_payload,jmespath_full_filter,kmeans_embedding_clusters,knn_graph_ivf,merge_exact_deep,multimodal_audio_chunks,multimodal_audio_pcm_chunks,multimodal_binary_meta,multimodal_decode_stats,multimodal_feature_extract,multimodal_frame_sample,multimodal_media_sniff,pack_sharded_bins,pack_split_sequences,pipeline_corpus_build,quality_calibrate_by_source,quality_decile_filter,sample_stratified_by_lang,scd2_user_state_history,sessionize_user_events,string_regexp_extract_all,text_clean_corpus_pipeline,text_language_id,text_ngram_novelty,text_pii_scrub,text_quality_score,text_repetition_stats,text_salient_terms,text_token_count,text_top_terms,text_winnowing_fingerprints,timeseries_similar_users,upsert_latest_state,window_hopping_events,window_session_events,window_tumbling_events"
python scripts/verify_sf1.py --sf-dir testdata_sf10 --sf 10 \
  --mode digest --only "$B3R" \
  --exclude dedup_fuzzy_levenshtein,dedup_winnowing_pairs \
  --out /tmp/sf10_part_b3r.json >> /tmp/sf10_sweep.log 2>&1
# b3r sorts after b3: merge's last-file-wins overwrites the error rows
python scripts/merge_sf10_parts.py >> /tmp/sf10_sweep.log 2>&1
echo "=== b3r done; starting bench_sf10 $(date +%H:%M:%S) ===" >> /tmp/sf10_sweep.log
python scripts/bench_sf10.py > /tmp/bench_sf10_r6.log 2>&1
echo "=== followup done $(date +%H:%M:%S) ===" >> /tmp/sf10_sweep.log
