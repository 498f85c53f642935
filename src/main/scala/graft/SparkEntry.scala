package graft

import graft.etl.Enrichment
import graft.operators._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every query aliases its output columns identically to its oracle SQL,
  * orders rows deterministically, and keeps numeric outputs in
  * BIGINT/DOUBLE (double aggregates go through exact DECIMAL sums — see
  * Analytics) so the DuckDB hash-compare is byte-stable.
  */
object SparkEntry {

  /** Flagship: decimal-exact pricing summary on sf0.001 — always ≥6
    * groups on any lineitem, no ns-timestamp dependency, so the smoke
    * check passes on any vanilla session. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q1Agg(Tables(spark, "/root/testdata/sf0.001"))

  private def q(f: Tables => DataFrame): (SparkSession, String) => DataFrame =
    (s, dir) => f(Tables(s, dir))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // —— reference-mirror ETL (SURVEY §2 table 1) ——
    "q_lookup_enrich"  -> q(Enrichment.lookupEnrich),
    "q_time_extract"   -> q(Enrichment.timeExtract),
    "q_text_clean"     -> q(Enrichment.textClean),
    "q_dict_map"       -> q(Enrichment.dictMap),
    "q_control_tags"   -> q(Enrichment.controlTags),
    "q_geo_area"       -> q(Enrichment.geoArea),
    "q_geo_area_sph"   -> q(Enrichment.geoAreaSpherical),
    "q_geo_valid"      -> q(Enrichment.geoAreaValid),
    "q_mint_ids"       -> q(Enrichment.mintIds),
    "q_keywords"       -> q(Enrichment.keywords),
    // —— core analytics (SURVEY §2 table 2) ——
    "q1_agg"           -> q(Analytics.q1Agg),
    "q3_shipping"      -> q(Analytics.q3Shipping),
    "q5_local"         -> q(Analytics.q5Local),
    "q_topk_group"     -> q(Analytics.topkGroup(_)),
    "q_window_running" -> q(Analytics.windowRunning),
    "q_rollup"         -> q(Analytics.rollupAgg),
    "q_pivot"          -> q(Analytics.pivotEvents),
    "q_json_extract"   -> q(Analytics.jsonExtract),
    "q_distinct"       -> q(Analytics.distinctUsers),
    "q_percentile"     -> q(Analytics.percentiles),
    "q_asof_join"      -> q(AsOfJoin.purchaseToLastClick),
    "q_sessionize"     -> q(Sessionize.sessionize),
    // —— LLM-training-data ops (SURVEY §2 table 3) ——
    "q_langid"         -> q(TextAnalysis.langId),
    "q_quality"        -> q(TextAnalysis.quality),
    "q_tokens"         -> q(TextAnalysis.tokenCounts),
    "q_fingerprint"    -> q(TextAnalysis.fingerprint),
    "q_dedup_exact"    -> q(Dedup.exact),
    "q_ngram_jaccard"  -> q(Dedup.ngramJaccard),
    // PPJoin prefix-filtered EXACT set-similarity join (r16): the
    // deterministic complement to MinHash — no false negatives, never
    // all-pairs (rare-token prefix equi-join + length filter)
    "q_setjoin_prefix" -> q(Dedup.setJoinPrefix),
    "q_knn_cosine"     -> q(Similarity.knnCosine(_)),
    // fully oracled LSH: md5-derived hashes reproduce every
    // intermediate integer in DuckDB (see Dedup.md5Hash31 /
    // simhashMd5Fingerprints scaladoc)
    "q_dedup_minhash"  -> q(Dedup.minhash),
    // the giant-bucket guard engaged (maxBucket=2) — same md5 family,
    // bucket-size filter replayed by the oracle
    "q_dedup_minhash_cap" -> q(Dedup.minhashCap),
    // one-permutation MinHash (one hash per shingle instead of numPerm)
    // with rotation densification — md5 family, every densified slot
    // (m + d·P31) replayed by the oracle
    "q_dedup_minhash_oph" -> q(Dedup.minhashOph),
    // overlap-coefficient (doc-inside-doc) verify over the same md5
    // LSH candidates as q_dedup_minhash
    "q_containment"    -> q(Dedup.containment),
    "q_dedup_simhash"  -> q(Dedup.simhash),
    // batch-vs-index probe (daily-increment shape), md5 oracled
    "q_dedup_incremental" -> q(Dedup.minhashIncremental(_)),
    // throughput twins of the two above (xxhash64 / FNV kernels — the
    // path a 100 TB run ships): benched under their own keys so the
    // production kernels' regressions stay visible; rows-only driver
    // check (no DuckDB twin for the hash family), spec-verified
    "q_dedup_minhash_fast" -> q(Dedup.minhashFast),
    "q_dedup_minhash_oph_fast" -> q(Dedup.ophFast),
    "q_dedup_simhash_fast" -> q(Dedup.simhashFnv),
    // oracled md5-Rademacher hyperplane LSH (DuckDB replays the index
    // build) + the Gaussian multiprobe production kernel benched under
    // its own key (RNG planes → rows-only, spec-covered)
    "q_dedup_embed"    -> q(Dedup.embedDedupMd5),
    "q_dedup_embed_mp" -> q(Dedup.embedDedup),
    "q_line_dedup"     -> q(Dedup.lineDedup(_)),
    "q_ann_recall"     -> q(Dedup.annRecallAudit),
    "q_jsonl_ingest"   -> q(t => graft.sources.JsonLines.roundtrip(t)),
    // WebDataset-style TAR shards: POSIX ustar pack + parse inside the
    // plan (system-tar interop spec'd); oracled as the identity
    "q_tar_roundtrip"  -> q(t => graft.sources.TarShards.tarRoundtrip(t)),
    // oracled engine-exact IVF (integer index build replayed by DuckDB)
    // + the float-Lloyd production kernel benched under its own key
    "q_knn_ivf"        -> q(Similarity.ivfKnnExact(_)),
    // metadata-filtered ANN (r16): label pre-filter pushed into the
    // posting-list scan — category-scoped vector search, fully oracled
    "q_knn_filtered"   -> q(Similarity.ivfKnnFiltered(_)),
    "q_knn_ivf_fp"     -> q(Similarity.knnIvf(_)),
    // two-level coarse quantizer twin (r15): no stage computes
    // |queries|·nlist dots — the corpus-scaled-nlist production shape
    "q_knn_ivf_2l"     -> q(Similarity.knnIvf2l(_)),
    // graph ANN (r16): NN-descent build + beam search — the oracled
    // integer variant replays the WHOLE graph build in DuckDB; the
    // float twin is the serving kernel (recall bound in GraphAnnSpec)
    "q_knn_graph"      -> q(GraphAnn.knnGraphExact(_)),
    "q_knn_graph_fp"   -> q(GraphAnn.knnGraphFp(_)),
    // engine-exact two-level build (r16): the 2-level quantizer
    // graduated to the DuckDB gate — Forgy-seeded supers + per-super
    // Forgy children, one exact Lloyd round per tier
    "q_knn_ivf_2lx"    -> q(Similarity.ivfKnn2lExact(_)),
    // IVF+PQ composed (FAISS IVFADC): oracled exact twin + the float
    // production kernel benched under its own key
    // JL random projection: md5-parity Rademacher matrix, milli-snap
    // integer distances, sample-bounded pair distortion audit
    "q_random_proj"    -> q(Similarity.randomProj(_)),
    // hard-negative mining: exact micro-int cosine, wrong-label top-k
    // per md5-coin-sampled anchor
    "q_hard_negatives" -> q(Similarity.hardNegatives(_)),
    // MMR diverse reranking: greedy rel − max-sim-to-selected over the
    // top-depth candidates, trajectory engine-exact
    "q_mmr_rerank"     -> q(Similarity.mmrRerank(_)),
    // margin-criterion bitext mining: distance-margin over micro-int
    // cosines, forward∩backward mutual-best (LASER/CCMatrix rule);
    // the IVF-probe scale twin replaces the dense lang×lang matrix
    // with per-cell candidate equi-joins (rows-only — margin+mutual
    // stage shared verbatim with the oracled dense sibling)
    "q_bitext_mine"    -> q(Similarity.bitextMine(_)),
    "q_bitext_mine_ivf" -> q(Similarity.bitextMineIvf(_)),
    // distinct-n diversity + Zipf octave-mass audit (corpus QC)
    "q_distinct_ngrams" -> q(TextAnalysis.distinctNgrams),
    "q_zipf_audit"     -> q(TextAnalysis.zipfAudit),
    // native codegen'd NFC normalization (java.text.Normalizer under
    // whole-stage codegen), oracled against DuckDB's nfc_normalize
    "q_unicode_norm"   -> q(TextAnalysis.unicodeNorm),
    // positional-index phrase search: adjacency as a join key
    "q_phrase_search"  -> q(Retrieval.phraseSearch(_)),
    "q_knn_ivfpq"      -> q(Similarity.ivfPqKnnExact(_)),
    "q_knn_ivfpq_fp"   -> q(Similarity.ivfPqKnn(_)),
    // —— document assembly, push log, streaming-equivalent, multimodal ——
    "q_doc_assembly"   -> q(etl.DocumentAssembly.assemble),
    "q_doc_assembly24" -> q(etl.DocumentAssembly.assemble2024),
    "q_push_log"       -> q(graft.sinks.HttpPushSink.pushLog),
    "q_stream_window"  -> q(graft.streaming.EventStreams.streamWindowBatch),
    // built-in session_window: engine-managed gap sessions, oracled
    // via the gaps-and-islands replay (end = last event + gap)
    "q_session_window" -> q(graft.streaming.EventStreams.sessionWindowBatch),
    "q_multimodal_meta" -> q(Multimodal.mediaMeta),
    "q_multimodal_feat" -> q(Multimodal.mediaFeatures(_)),
    // REAL codec round-trip: ImageIO PNG encode → ImageIO decode →
    // pixel stats; lossless, so stats replay as integer/double SQL
    "q_multimodal_decode" -> q(Multimodal.realMediaFeatures(_)),
    // REAL resize round-trip: PNG encode -> bilinear Graphics2D resize
    // -> decode; solid-color pixels and pinned-long-side dims are an
    // exact integer function of (doc_id, maxSide) => fully oracled
    "q_multimodal_resize" -> q(Multimodal.realResizeFeatures(_)),
    // REAL multi-frame container round-trip: animated-GIF encode (LZW,
    // explicit per-frame palette => lossless) -> ImageIO frame
    // extraction -> exact per-frame color stats, fully oracled
    "q_frame_extract"  -> q(Multimodal.realFrameFeatures(_)),
    // REAL audio round-trip: 16-bit PCM WAV encode (javax.sound RIFF
    // writer) -> container decode -> exact integer sample stats
    "q_audio_features" -> q(Multimodal.realAudioFeatures(_)),
    // WebDataset end-to-end: three real codecs into ustar shards ->
    // loader regroups by key -> per-modality decode, all oracled
    "q_webdataset"     -> q(Multimodal.webdatasetFeatures(_)),
    // WARC (ISO 28500 / Common Crawl) end-to-end (r17): HTML pages →
    // per-record-gzip WARC shards → in-plan parse → text extraction,
    // gated on byte-exact body recovery (md5)
    "q_warc_extract"   -> q(Multimodal.warcExtract),
    // the .tar.gz-from-DISK loader loop (r15): gzip -> executor-side
    // file writes -> binaryFile re-read -> magic-sniff inflate ->
    // regroup; text modality byte-exact under the DuckDB gate
    "q_webdataset_gz"  -> q(Multimodal.webdatasetGzFromDisk(_)),
    // perceptual-hash image dedup (r16): REAL PNG encode->decode->dHash,
    // Hamming-LSH band join (complete for <=2 bits), component closure;
    // the md5-derived pixel formula makes the whole chain oracled
    "q_image_phash"    -> q(Multimodal.imagePhash),
    // —— relational completeness ——
    "q_semi_anti"      -> q(Relational.semiAnti),
    "q_setops"         -> q(Relational.setOps),
    "q_cube"           -> q(Relational.cubeAgg),
    "q_string_agg"     -> q(Relational.stringAgg),
    "q_subquery"       -> q(Relational.subquery),
    "q_range_window"   -> q(Relational.rangeWindow),
    "q_first_last"     -> q(Relational.firstLast),
    "q_date_math"      -> q(Relational.dateMath),
    "q_str_funcs"      -> q(Relational.strFuncs),
    "q_grouping_sets"  -> q(Relational.groupingSets),
    "q_regex"          -> q(Relational.regexExtract),
    "q_having"         -> q(Relational.havingAgg),
    "q_histogram"      -> q(Relational.histogram),
    "q_ntile"          -> q(Relational.ntileQuartiles),
    "q_null_semantics" -> q(Relational.nullSemantics),
    // —— corpus curation (composed training-data pipeline) ——
    "q_corpus_curate"  -> q(Curation.curate),
    // jusText-style boilerplate extraction: synthesized HTML page →
    // script strip → block-line split → link-density classification
    "q_html_extract"   -> q(Curation.htmlExtract),
    // C4-style phrase-blocklist filter: broadcast deny-list joined
    // against the 1/2-gram explode, zero-hit docs kept with zeros
    "q_blocklist"      -> q(Curation.blocklistFilter(_)),
    // URL canonicalization: lowercase scheme/host, default-port strip,
    // fragment + tracking-param drop, sorted query — synthesized URLs
    "q_url_canon"      -> q(Curation.urlCanon),
    "q_corpus_stats"   -> q(Curation.corpusStats),
    "q_shard_balance"  -> q(Curation.shardBalance(_)),
    "q_sample_hash"    -> q(Curation.sampleHash),
    "q_stratified_sample" -> q(Curation.stratifiedSample(_)),
    // Duffield–Lund–Thorup priority sampling: md5-uniform draw, one
    // IEEE division — transcendental-free so both engines rank
    // identically
    "q_weighted_sample" -> q(Curation.weightedSample(_)),
    // —— round 2: interval join, graph, text-pipeline, TPC-H widening ——
    "q_range_join"     -> q(RangeJoin.clicksBeforePurchase),
    // interval x interval overlap join (r16): both sides are ranges —
    // week-bucketed candidates, counted once in the overlap-start week
    "q_interval_join"  -> q(RangeJoin.intervalJoin),
    // span-classed interval join (r17): heavy-tailed spans split into
    // short (bounded grid) / long (broadcast) classes, three
    // class-disjoint join families partition the pair space
    "q_interval_join_skew" -> q(RangeJoin.intervalJoinSkew),
    "q_components"     -> q(Components.copurchaseClusters(_)),
    // synchronous LPA, deterministic ties, fixed rounds — trajectory
    // replayed round-by-round in the oracle (the CTE-unroll device)
    "q_label_prop"     -> q(Components.copurchaseCommunities(_)),
    // prefix-doubling suffix-array ranks gated by substring grouping:
    // rank groups == raw-substr groups, so the oracle checks the
    // whole distributed doubling construction
    "q_repeated_spans" -> q(SuffixArray.repeatedSpans(_)),
    // exact-substring doc dedup on the SA ranks: span groups (hub cap)
    // -> star edges -> components -> min-id survivors
    "q_sa_dedup"       -> q(SuffixArray.saDedup(_)),
    "q_pii_redact"     -> q(TextAnalysis.piiRedact),
    "q_tfidf"          -> q(TextAnalysis.tfIdf),
    "q_word_count"     -> q(TextAnalysis.wordCount),
    "q_array_funcs"    -> q(Relational.arrayFuncs),
    "q_window_dedup"   -> q(Relational.windowDedup),
    "q_rank_funcs"     -> q(Relational.rankFuncs),
    "q_unpivot"        -> q(Relational.unpivotCounts),
    "q_hop_window"     -> q(Relational.hopWindow),
    "q_snapshot_diff"  -> q(Relational.snapshotDiff),
    // the same classification driven through the REAL table layer:
    // SnapshotStore commit v1/v2 -> readChanges CDC -> agg (oracled
    // against the plain full-outer diff, minus the suppressed S row)
    "q_snapshot_cdc"   -> q(Relational.snapshotCdc),
    // SQL MERGE INTO with conditional matched/not-matched clauses over
    // the real table layer (r17): first-match-wins UPDATE/DELETE +
    // filtered INSERT, oracled as a full-outer CASE ladder in DuckDB
    "q_merge_into"     -> q(Relational.mergeIntoDemo),
    // deletion vectors through the real table layer (r17): mask ->
    // masked read -> DV-CDC deletes -> compaction materialization,
    // all replayed by DuckDB as plain order slices
    "q_snapshot_dv"    -> q(Relational.snapshotDv),
    // version-attributed CDC (r17, Delta CDF's _commit_version):
    // per-commit keyed deltas stamped with their producing version
    "q_cdc_versions"   -> q(Relational.cdcVersions),
    // incremental view maintenance (r16): an aggregate view merged
    // forward from unkeyed CDC deltas only — never re-aggregating the
    // base; the oracle is the FULL recompute, so the gate proves
    // incremental == recompute
    "q_ivm"            -> q(Relational.ivm),
    // Deequ-style data-quality audit (r16): scan-level constraints in
    // ONE aggregate pass + uniqueness + broadcast ref-integrity +
    // cross-table consistency, all exact BIGINT counts
    "q_dq_audit"       -> q(DataQuality.dqAudit),
    // row-level DELETE commits (r15): stats-pruned takedown through
    // the real table layer + the keyed CDC delete delta, oracled
    "q_snapshot_delete" -> q(Relational.snapshotDelete),
    // stats-sidecar scan planning (r15): file-level range pruning on
    // the READ path (readWhere), oracled vs a plain WHERE over orders
    "q_snapshot_prune" -> q(Relational.snapshotPrune),
    // all-column stats (r18): readWhere pruning on a column the
    // caller never declared as the stats key, oracled
    "q_snapshot_prune_multi" -> q(Relational.snapshotPruneMulti),
    // partitionBy + equality elimination (r18): value-clustered
    // commit, readWhereEq partition prune, oracled
    "q_snapshot_partition" -> q(Relational.snapshotPartition),
    // RESTORE as a commit (r18): rollback diff (resurrected DV masks,
    // dropped appends) + restored live state, oracled
    "q_restore" -> q(Relational.restoreDemo),
    // predicate row-level verbs (r18): DELETE FROM ... WHERE and
    // UPDATE ... SET ... WHERE statements, oracled
    "q_delete_where" -> q(Relational.deleteWhereDemo),
    "q_update_where" -> q(Relational.updateWhereDemo),
    "q6_forecast"      -> q(Relational.q6Forecast),
    "q4_priority"      -> q(Relational.q4Priority),
    "q12_shipmode"     -> q(Relational.q12Shipmode),
    "q14_promo"        -> q(Relational.q14Promo),
    // —— event-sequence analytics + text indexing ——
    "q_funnel"         -> q(EventAnalytics.funnel),
    "q_cohort"         -> q(EventAnalytics.cohortRetention),
    "q_transitions"    -> q(EventAnalytics.transitions),
    "q_gap_fill"       -> q(EventAnalytics.gapFill),
    // gaps-and-islands streaks (r16): consecutive active-day runs via
    // the day - row_number constant, no self-join or recursive walk
    "q_streaks"        -> q(EventAnalytics.streaks),
    "q_zscore"         -> q(EventAnalytics.zscore),
    "q_inverted_index" -> q(TextAnalysis.invertedIndex(_)),
    // —— training-pipeline corpus ops (round 3) ——
    "q_bigram_lm"      -> q(TextAnalysis.bigramLm(_)),
    "q_dup_spans"      -> q(TextAnalysis.dupSpans(_)),
    "q_lm_novelty"     -> q(TextAnalysis.lmNovelty(_)),
    "q_ttr"            -> q(TextAnalysis.typeTokenRatio(_)),
    "q_filter_funnel"  -> q(TextAnalysis.filterFunnel),
    "q_decontaminate"  -> q(TextAnalysis.decontaminate(_)),
    "q_token_pack"     -> q(Curation.tokenPack(_)),
    // —— round-5 curation ops, registered round 7 ——
    "q_block_dedup"    -> q(Dedup.blockDedup(_)),
    "q_chunk_overlap"  -> q(Curation.chunkOverlap(_)),
    // content-defined chunking (word-level FastCDC) + chunk-level
    // dedup: boundaries from the md5 gram hash mod target, so an edit
    // shifts one chunk, not the whole slicing; both oracled
    "q_cdc_chunks"     -> q(Curation.cdcChunks(_)),
    "q_chunk_dedup"    -> q(Curation.cdcChunkDedup(_)),
    "q_repetition"     -> q(TextAnalysis.repetition),
    "q_pmi_colloc"     -> q(TextAnalysis.pmiColloc(_)),
    "q_mixture_weights" -> q(Curation.mixtureWeights(_)),
    // —— round-7 additions: corpus profiling / tokenizer / vector audit ——
    "q_doclen_hist"    -> q(TextAnalysis.doclenHist),
    "q_winnowing"      -> q(TextAnalysis.winnowing(_)),
    "q_dedup_clusters" -> q(Dedup.dedupClusters),
    "q_bpe_pairs"      -> q(TextAnalysis.bpePairs(_)),
    // iterative BPE merge training: 4 elected merges, rounds 2-4
    // counted over the round-(N-1) REWRITTEN symbol table, so the
    // oracle checks merge application, not just election
    "q_bpe_train"      -> q(TextAnalysis.bpeTrain(_)),
    // corpus encode under the trained merges: per-doc token counts
    // under the learned vocabulary
    "q_bpe_encode"     -> q(TextAnalysis.bpeEncode(_)),
    "q_unigram_encode" -> q(TextAnalysis.unigramEncode(_)),
    // WordPiece greedy longest-match-first under the same seed vocab
    // (third tokenizer family; cost provably >= the Viterbi minimum)
    "q_wordpiece_encode" -> q(TextAnalysis.wordpieceEncode(_)),
    // the 32k-vocab deploy path: per-type piece maps by equi-join
    // (probe cost independent of |V|) — result-identical kernels,
    // oracled against the SAME SQL as their literal-map twins
    "q_unigram_encode_join" -> q(TextAnalysis.unigramEncodeJoined(_)),
    "q_wordpiece_encode_join" -> q(TextAnalysis.wordpieceEncodeJoined(_)),
    // deploy-time vocab mismatch: clean-corpus vocab vs OOV-corrupted
    // docs — BERT's [UNK] arm exercised and oracled (r15)
    "q_wordpiece_unk" -> q(TextAnalysis.wordpieceEncodeUnk(_)),
    // one Viterbi-EM training round under the same seed vocab: path-
    // carrying DP → usage counts → re-estimated costs + prune set
    "q_unigram_train"  -> q(TextAnalysis.unigramTrain(_)),
    // CCNet-style LM-perplexity scoring: integer floor-log2 bigram LM
    // trained on the lang='en' slice, exact-ppm bits per bigram
    "q_perplexity"     -> q(TextAnalysis.lmPerplexity),
    // CCNet head/middle/tail: per-lang perplexity tertiles
    "q_ccnet_bucket"   -> q(TextAnalysis.ccnetBuckets),
    // temperature-1/2 source mixture via integer sqrt weights
    "q_sqrt_mixture"   -> q(Curation.sqrtMixture),
    // multinomial Naive Bayes lang classifier (fastText-filter shape):
    // even-id train / odd-id score, integer costs, confusion matrix
    "q_nb_classify"    -> q(TextAnalysis.nbClassify),
    // in-engine quality-classifier TRAINING (r15, fastText-distill
    // shape): hard-sigmoid logistic GD in exact bigint micro units —
    // 6 full-batch epochs, one gradient-sized aggregate per epoch;
    // DuckDB replays the entire fit
    "q_logreg_train"   -> q(QualityModel.logregTrain),
    "q_logreg_score"   -> q(QualityModel.logregScore),
    // the deployment composition: model-score gate -> exact dedup ->
    // per-source yield, oracled end-to-end through the trained fit
    "q_logreg_filter"  -> q(QualityModel.logregFilter),
    // compression-ratio quality signal (r15): the REAL zlib deflate
    // kernel per doc (rows-only — no SQL engine replays zlib; the
    // repetitive≪prose≪high-entropy ordering is spec-pinned)
    "q_comp_ratio"     -> q(TextAnalysis.compressionRatio),
    // character-entropy quality signal (r16): the oracle-able half of
    // the gibberish detector — integer bit-length entropy proxy,
    // in-row HOF histogram, zero shuffles
    "q_char_entropy"   -> q(TextAnalysis.charEntropy),
    // isotonic (PAV) calibration of the quality score (r16): closed-form
    // max-min over a 16-bin aggregate; the corpus pass is one map-side
    // scan, everything monotone-fit happens on a constant-size frame
    "q_calibrate"      -> q(QualityModel.calibrate),
    // SymSpell deletion-neighborhood spell linkage (r16): fuzzy join as
    // an EQUI-join on deletion variants, levenshtein only on candidates
    "q_symspell"       -> q(TextAnalysis.symspell),
    // Cavnar-Trenkle rank-profile LID: char-trigram profiles,
    // out-of-place distance, same train/score harness
    "q_ct_langid"      -> q(TextAnalysis.ctLangId(_)),
    // count-min sketch under the oracle gate: md5-family hashes, exact
    // audit column beside the estimate
    "q_heavy_hitters"  -> q(TextAnalysis.heavyHitters(_)),
    // bloom-filter decontamination with the exact join as FP audit
    "q_bloom_decontaminate" -> q(TextAnalysis.bloomDecontaminate(_)),
    // bloom saturation dashboard: fill ratio, predicted fill^k FP
    // rate, measured FP rate from the exact audit
    "q_bloom_saturation" -> q(TextAnalysis.bloomSaturation(_)),
    // HyperLogLog cardinality with exact audit (integer register sums)
    "q_hll_audit"      -> q(TextAnalysis.hllAudit(_)),
    "q_source_audit"   -> q(Curation.sourceAudit),
    "q_seq_pack"       -> q(Curation.seqPack(_)),
    "q_embed_stats"    -> q(Similarity.embedStats),
    // —— round-8 additions: retrieval / data-selection / blocked ER ——
    "q_bm25"           -> q(Retrieval.bm25(_)),
    "q_dsir"           -> q(Retrieval.dsirWeights(_)),
    // hybrid retrieval: RRF of BM25 + exact-ppm cosine (two IEEE
    // divisions in fixed order — fused score bit-exact cross-engine)
    "q_rrf_fusion"     -> q(Retrieval.rrfFusion(_)),
    "q_domain_cap"     -> q(Curation.domainCap(_)),
    "q_domain_parse"   -> q(Curation.domainParse),
    "q_dedup_embed_exact" -> q(Dedup.embedDedupExact),
    "q_semdedup"       -> q(Dedup.semDedup),
    "q_gopher_rules"   -> q(TextAnalysis.gopherRules(_)),
    "q_vocab_prune"    -> q(TextAnalysis.vocabPrune(_)),
    "q_word_drift"     -> q(TextAnalysis.wordDrift(_)),
    "q_cooc_window"    -> q(TextAnalysis.coocWindow(_)),
    "q_span_corrupt"   -> q(TextAnalysis.spanCorrupt(_)),
    "q_soft_dedup"     -> q(Dedup.softDedup),
    "q_lsh_audit"      -> q(Dedup.lshAudit),
    "q_pagerank"       -> q(Components.docPageRank(_)),
    // degree-ordered triangle counting over the co-purchase graph
    "q_triangles"      -> q(Components.copurchaseTriangles(_)),
    "q_split_assign"   -> q(Curation.splitAssign(_)),
    // the composed filter→dedup→pack→split pipeline, fully oracled
    "q_pipeline_e2e"   -> q(Curation.pipelineE2E(_)),
    "q_epoch_shuffle"  -> q(Curation.epochShuffle(_)),
    "q_shard_checksum" -> q(Curation.shardChecksum(_)),
    // Hilbert vs z-order locality audit (r16): both curve kernels are
    // pure integer bit math replayed exactly in DuckDB; spans over
    // offset tiles are the file-skipping quality metric
    "q_hilbert"        -> q(Curation.hilbertLocality),
    "q_centroid_update" -> q(Similarity.centroidUpdate),
    // per-label farthest-from-centroid sweep (encoder-glitch QC)
    "q_embed_outliers" -> q(Similarity.embedOutliers(_)),
    // full Lloyd loop (2 iterations, micro-int distances, driver-side
    // bounded centroid state baked as literals — assignment is
    // map-side, the M-step is the only shuffle)
    "q_kmeans"         -> q(Similarity.kmeans(_)),
    "q_source_dup_matrix" -> q(Dedup.sourceDupMatrix),
    "q_substr_dedup"   -> q(Dedup.substrDedup(_)),
    "q_span_islands"   -> q(Dedup.spanIslands(_)),
    "q_pq_encode"      -> q(Similarity.pqEncode(_)),
    "q_pq_adc"         -> q(Similarity.pqAdcKnn(_)),
    "q_partial_reagg"  -> q(Analytics.partialReagg),
    "q_quantize"       -> q(Similarity.quantizeInt8),
    "q_scd2"           -> q(EventAnalytics.scd2(_)),
    "q_salted_join"    -> q(SkewJoin.saltedEnrich),
    "q_spatial_join"   -> q(SpatialJoin.eventsInZones),
    "q_fuzzy_match"    -> q(Dedup.fuzzyMatches(_)),
    "q_hierarchy"      -> q(Components.customerHierarchy),
    "q_ratio_report"   -> q(Analytics.ratioToReport),
    "q_dedup_best"     -> q(Dedup.keepBest),
    "q_not_in_null"    -> q(Relational.notInNull),
    // —— remaining TPC-H suite shapes (operators/TpcHShapes.scala) ——
    "q7_volume"        -> q(TpcHShapes.q7Volume(_)),
    "q8_share"         -> q(TpcHShapes.q8Share(_)),
    "q9_profit"        -> q(TpcHShapes.q9Profit(_)),
    "q10_returns"      -> q(TpcHShapes.q10Returns),
    "q13_custdist"     -> q(TpcHShapes.q13CustDist),
    "q15_topsupp"      -> q(TpcHShapes.q15TopSupp),
    "q17_smallqty"     -> q(TpcHShapes.q17SmallQty(_)),
    "q18_bigorder"     -> q(TpcHShapes.q18BigOrder(_)),
    "q19_disc"         -> q(TpcHShapes.q19Disc),
    "q22_idle"         -> q(TpcHShapes.q22Idle),
    "q2_mincost"       -> q(TpcHShapes.q2MinCost(_)),
    "q11_important"    -> q(TpcHShapes.q11Important(_)),
    "q16_partsupp"     -> q(TpcHShapes.q16PartSupp(_)),
    "q20_potential"    -> q(TpcHShapes.q20Potential(_)),
    "q21_waiting"      -> q(TpcHShapes.q21Waiting(_))
  )

  // DuckDB-dialect oracles over the same parquet tables. DECIMAL casts
  // mirror the Spark side exactly (see Analytics scaladoc).
  private val SumDisc =
    "SUM(CAST(l_extendedprice AS DECIMAL(9,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))"

  /** Shared WITH-pipeline of the md5 MinHash oracle (shingle → 31-bit
    * hash → universal-family signatures → structural band keys →
    * candidates → exact Jaccard in CTE `j`) — the common prefix of
    * q_dedup_minhash (pair list) and q_dedup_clusters (recursive
    * closure of the pair graph). */
  /** Shared WITH-pipeline of the blocked-ER embedding oracle (micro-int
    * quantize → norms → within-label pair dots → cos-ppm snap in CTE
    * `s`) — the common prefix of q_dedup_embed_exact (pair list) and
    * q_semdedup (recursive closure). The ppm snap text comes verbatim
    * from Dedup.cosPpmSql, the same expression the Spark plan runs. */
  private lazy val embedExactOracleCore: String =
    s"""WITH q AS (SELECT vec_id, label,
      |    list_transform(embedding,
      |      x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS m
      |  FROM embeddings),
      |w AS (SELECT vec_id, label, m,
      |        CAST(list_sum(list_transform(m, x -> x * x)) AS BIGINT) AS aa FROM q),
      |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |        CAST(list_sum(list_transform(generate_series(1, len(a.m)),
      |          i -> a.m[i] * b.m[i])) AS BIGINT) AS dot,
      |        a.aa AS aa, b.aa AS bb
      |      FROM w a JOIN w b ON a.label = b.label AND a.vec_id < b.vec_id),
      |s AS (SELECT id_a, id_b, ${operators.Dedup.cosPpmSql} AS cos_ppm FROM p)""".stripMargin

  /** Shared perplexity CTEs (bigram counts → reference-slice LM →
    * per-doc integer bits) — the common prefix of q_perplexity (the
    * per-doc frame) and q_ccnet_bucket (the per-lang tertile cut). */
  private lazy val perplexityOracleCore: String =
    """WITH tok AS (SELECT doc_id, lang, string_split(text, ' ') AS l FROM documents),
      |pos AS (SELECT doc_id, lang, l, unnest(generate_series(1, len(l) - 1)) AS i FROM tok),
      |bg AS (SELECT doc_id, lang, l[i] || ' ' || l[i+1] AS bg,
      |         CAST(COUNT(*) AS BIGINT) AS c
      |       FROM pos GROUP BY 1, 2, 3),
      |refbg AS (SELECT bg, CAST(SUM(c) AS BIGINT) AS cb
      |          FROM bg WHERE lang = 'en' GROUP BY bg),
      |refctx AS (SELECT split_part(bg, ' ', 1) AS w1, CAST(SUM(c) AS BIGINT) AS cw
      |           FROM bg WHERE lang = 'en' GROUP BY 1),
      |costs AS (SELECT bg, CAST(length(bin(cw)) - length(bin(cb)) AS BIGINT) AS cost
      |          FROM refbg JOIN refctx ON split_part(refbg.bg, ' ', 1) = refctx.w1),
      |px AS (SELECT b.doc_id, b.lang,
      |         CAST(SUM(b.c) AS BIGINT) AS n_bigrams,
      |         CAST(SUM(b.c * COALESCE(costs.cost, 24)) AS BIGINT) AS cost_units,
      |         CAST(CAST(SUM(b.c * COALESCE(costs.cost, 24)) AS BIGINT) * 1000000
      |           // CAST(SUM(b.c) AS BIGINT) AS BIGINT) AS bits_ppm
      |       FROM bg b LEFT JOIN costs USING (bg)
      |       GROUP BY b.doc_id, b.lang)""".stripMargin

  /** Shared PQ CTEs (subvector micro values → seeded codebook → exact
    * per-centroid distances → per-subspace best code); extended by
    * q_pq_encode and q_pq_adc. */
  private lazy val pqOracleCore: String =
    """WITH p AS (SELECT vec_id, embedding,
      |             unnest(generate_series(1, len(embedding))) AS i
      |           FROM embeddings),
      |v AS (SELECT vec_id,
      |        CAST((i - 1) // 8 AS BIGINT) AS s,
      |        CAST((i - 1) % 8 AS BIGINT) AS sd,
      |        CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS m
      |      FROM p),
      |sv AS (SELECT v.*,
      |         ('0x' || substr(md5(CAST(vec_id AS VARCHAR) || ':' ||
      |            CAST(s AS VARCHAR)), 1, 8))::BIGINT % 16 AS c
      |       FROM v),
      |cent AS (SELECT s, c, sd,
      |           CAST(FLOOR(CAST(SUM(m) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
      |                AS BIGINT) AS cm
      |         FROM sv GROUP BY s, c, sd),
      |d AS (SELECT v.vec_id, v.s, cent.c,
      |        CAST(SUM((v.m - cent.cm) * (v.m - cent.cm)) AS BIGINT) AS d2
      |      FROM v JOIN cent ON v.s = cent.s AND v.sd = cent.sd
      |      GROUP BY v.vec_id, v.s, cent.c),
      |best AS (SELECT vec_id, s, c, d2,
      |           ROW_NUMBER() OVER (PARTITION BY vec_id, s
      |                              ORDER BY d2, c) AS rn
      |         FROM d)""".stripMargin

  /** The MinHash SIGNATURE stage as DuckDB CTEs over an arbitrary
    * source relation (must expose doc_id, text): shingles (`sh`/`gl`)
    * and band keys (`bk`). Pair closers compose on top — the standard
    * self-join ([[minhashCoreCtes]]) or the incremental batch-vs-index
    * join (q_dedup_incremental). */
  private def minhashSigCtes(src: String): String = {
    val perms = graft.operators.Dedup.mixConstants(32).zipWithIndex
      .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")
    s"""tok AS (SELECT doc_id, string_split(text, ' ') AS l FROM $src),
       |pos AS (SELECT doc_id, l, unnest(generate_series(1, len(l) - 2)) AS i FROM tok),
       |sh AS (SELECT DISTINCT doc_id, array_to_string(l[i:i+2], ' ') AS g FROM pos),
       |h AS (SELECT doc_id, ('0x' || substr(md5(g), 1, 8))::BIGINT & 2147483647 AS hv FROM sh),
       |perm(i, a, b) AS (VALUES $perms),
       |sig AS (SELECT doc_id, i, MIN((a * hv + b) % 2147483647) AS m
       |        FROM h CROSS JOIN perm GROUP BY doc_id, i),
       |bk AS (SELECT doc_id, i // 4 AS band,
       |              array_to_string(list(m ORDER BY i), ',') AS key
       |       FROM sig GROUP BY doc_id, i // 4),
       |gl AS (SELECT doc_id, list(DISTINCT g) AS gs FROM sh GROUP BY doc_id)""".stripMargin
  }

  /** [[minhashSigCtes]] closed with the self-join pair stage — `j` is
    * the verified-Jaccard candidate pair frame. Shared by the minhash
    * family and the end-to-end pipeline oracle. */
  private def minhashCoreCtes(src: String): String =
    s"""${minhashSigCtes(src)},
       |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |         FROM bk x JOIN bk y
       |           ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id),
       |j AS (SELECT c.doc_a, c.doc_b,
       |        CAST(len(list_intersect(xa.gs, yb.gs)) AS DOUBLE)
       |          / (len(xa.gs) + len(yb.gs) - len(list_intersect(xa.gs, yb.gs))) AS jaccard
       |      FROM cand c JOIN gl xa ON xa.doc_id = c.doc_a
       |                  JOIN gl yb ON yb.doc_id = c.doc_b)""".stripMargin

  private lazy val minhashOracleCore: String = "WITH " + minhashCoreCtes("documents")

  /** One-permutation-hashing signature stage (Dedup.ophSignatures
    * twin): shingle hashes routed to bin hv%32, per-bin minima, empty
    * bins rotation-densified from the nearest non-empty bin to the
    * right (offset d·P31), then the same structural band keys. The
    * 32×32 grid join replays Spark's densification HOF exactly. */
  private def ophCoreCtes(src: String): String =
    s"""tok AS (SELECT doc_id, string_split(text, ' ') AS l FROM $src),
       |pos AS (SELECT doc_id, l, unnest(generate_series(1, len(l) - 2)) AS i FROM tok),
       |sh AS (SELECT DISTINCT doc_id, array_to_string(l[i:i+2], ' ') AS g FROM pos),
       |h AS (SELECT doc_id, ('0x' || substr(md5(g), 1, 8))::BIGINT & 2147483647 AS hv FROM sh),
       |ob AS (SELECT doc_id, hv % 32 AS bin, MIN(hv) AS m FROM h GROUP BY doc_id, hv % 32),
       |docs32 AS (SELECT DISTINCT doc_id FROM h),
       |grid AS (SELECT doc_id, r1.range AS k, r2.range AS d
       |         FROM docs32, range(0,32) r1, range(0,32) r2),
       |kd AS (SELECT g.doc_id, g.k, MIN(g.d) AS d
       |       FROM grid g JOIN ob o ON o.doc_id = g.doc_id AND o.bin = (g.k + g.d) % 32
       |       GROUP BY g.doc_id, g.k),
       |sig AS (SELECT kd.doc_id, kd.k AS i, o.m + kd.d * 2147483647 AS m
       |        FROM kd JOIN ob o ON o.doc_id = kd.doc_id AND o.bin = (kd.k + kd.d) % 32),
       |bk AS (SELECT doc_id, i // 4 AS band,
       |              array_to_string(list(m ORDER BY i), ',') AS key
       |       FROM sig GROUP BY doc_id, i // 4),
       |gl AS (SELECT doc_id, list(DISTINCT g) AS gs FROM sh GROUP BY doc_id),
       |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |         FROM bk x JOIN bk y
       |           ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id),
       |j AS (SELECT c.doc_a, c.doc_b,
       |        CAST(len(list_intersect(xa.gs, yb.gs)) AS DOUBLE)
       |          / (len(xa.gs) + len(yb.gs) - len(list_intersect(xa.gs, yb.gs))) AS jaccard
       |      FROM cand c JOIN gl xa ON xa.doc_id = c.doc_a
       |                  JOIN gl yb ON yb.doc_id = c.doc_b)""".stripMargin

  /** DuckDB twin of TextAnalysis.bpeTrain's CTE pipeline: `rounds`
    * chained (pair-count → election → recursive greedy merge) blocks
    * over the weighted word-type table. The merge rewrite is a
    * per-word linear recursion (pos advances 1, or 2 over an elected
    * pair), replaying Spark's aggregate() fold exactly — including the
    * no-remerge rule (a merged symbol can't pair with a following
    * right part in the same round). Closed by [[bpeTrainOracle]]
    * (merge table) and [[bpeEncodeOracle]] (corpus encode). */
  private def bpeTrainCtes(rounds: Int): String = {
    // every non-recursive CTE is MATERIALIZED: each iteration of a
    // recursive merge CTE evaluates its election scalar subqueries, and
    // without the hint DuckDB re-runs the whole upstream chain per
    // iteration — measured 244 s vs 0.35 s at sf0.01
    def elect(n: Int, src: String) =
      s"""p${n}x AS MATERIALIZED (SELECT c, syms, unnest(generate_series(1, len(syms) - 1)) AS i FROM $src),
         |p$n AS MATERIALIZED (SELECT syms[i] AS l, syms[i+1] AS r, CAST(SUM(c) AS BIGINT) AS n_occ
         |        FROM p${n}x GROUP BY l, r),
         |b$n AS MATERIALIZED (SELECT l, r, n_occ FROM p$n ORDER BY n_occ DESC, l, r LIMIT 1)""".stripMargin
    def rewrite(n: Int, src: String) =
      s"""m$n(tok, syms, c, pos, out) AS (
         |  SELECT tok, syms, c, 1, CAST([] AS VARCHAR[]) FROM $src
         |  UNION ALL
         |  SELECT tok, syms, c,
         |    CASE WHEN pos < len(syms) AND syms[pos] = (SELECT l FROM b$n)
         |              AND syms[pos+1] = (SELECT r FROM b$n)
         |         THEN pos + 2 ELSE pos + 1 END,
         |    list_append(out,
         |      CASE WHEN pos < len(syms) AND syms[pos] = (SELECT l FROM b$n)
         |                AND syms[pos+1] = (SELECT r FROM b$n)
         |           THEN (SELECT l FROM b$n) || (SELECT r FROM b$n) ELSE syms[pos] END)
         |  FROM m$n WHERE pos <= len(syms)),
         |w$n AS MATERIALIZED (SELECT tok, out AS syms, c FROM m$n WHERE pos > len(syms))""".stripMargin
    val blocks = (1 to rounds).map { n =>
      val src = if (n == 1) "w0" else s"w${n - 1}"
      // the final elected merge is still APPLIED (w$rounds) so encode
      // oracles can compose on the fully-rewritten symbol table
      s"${elect(n, src)},\n${rewrite(n, src)}"
    }.mkString(",\n")
    s"""WITH RECURSIVE
       |v AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
       |vc AS MATERIALIZED (SELECT tok, COUNT(*) AS c FROM v GROUP BY tok),
       |w0 AS MATERIALIZED (SELECT tok, string_split(tok, '') AS syms, c FROM vc WHERE length(tok) >= 2),
       |$blocks""".stripMargin
  }

  /** [[bpeTrainCtes]] closed with the merge-table projection. */
  private def bpeTrainOracle(rounds: Int): String = {
    val out = (1 to rounds).map { n =>
      if (n == 1) s"SELECT 1 AS round, l AS left_sym, r AS right_sym, n_occ FROM b1"
      else s"UNION ALL SELECT $n, l, r, n_occ FROM b$n"
    }.mkString("\n")
    s"""${bpeTrainCtes(rounds)}
       |$out
       |ORDER BY round""".stripMargin
  }

  /** [[bpeTrainCtes]] closed with the corpus ENCODE: every document's
    * token multiset joined to the fully-rewritten symbol table (w4);
    * single-char words encode to one symbol. */
  private def bpeEncodeOracle(rounds: Int): String =
    s"""${bpeTrainCtes(rounds)},
       |dt AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c FROM
       |         (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
       |       GROUP BY doc_id, tok),
       |wl AS (SELECT tok, CAST(len(syms) AS BIGINT) AS ns FROM w$rounds
       |       UNION ALL
       |       SELECT tok, 1 FROM vc WHERE length(tok) = 1)
       |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
       |       CAST(SUM(c * ns) AS BIGINT) AS n_syms
       |FROM dt JOIN wl USING (tok)
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  /** q_knn_graph's full DuckDB replay — NN-descent build (multi-seed
    * expander init, `rounds` candidate/re-rank rounds at `degree`) +
    * beam search (`hops` hops at `beam` from `seeds` entry points) —
    * GENERATED so the SQL stays in lockstep with
    * [[graft.operators.GraphAnn.knnGraphExact]]'s loop parameters:
    * every round and hop is one more CTE pair, exact bigint L2
    * throughout, every tie broken by id. */
  private def graphAnnOracle(degree: Int = 10, rounds: Int = 3,
                             initSeeds: Int = 3, seeds: Int = 8,
                             beam: Int = 8, hops: Int = 3, k: Int = 5,
                             nQueries: Int = 10): String = {
    // exact bigint L2 over the per-dim table v for a 2-column relation
    def score(rel: String, a: String, b: String): String =
      s"""SELECT $rel.$a, $rel.$b,
         |       CAST(SUM((x.m - y.m) * (x.m - y.m)) AS BIGINT) AS d
         |FROM $rel JOIN v x ON x.vec_id = $rel.$a
         |          JOIN v y ON y.vec_id = $rel.$b AND y.dim = x.dim
         |GROUP BY 1, 2""".stripMargin
    def top(src: String, key: String, other: String, lim: Int): String =
      s"""SELECT $key, $other FROM
         |  (SELECT $key, $other,
         |          ROW_NUMBER() OVER (PARTITION BY $key ORDER BY d, $other) AS rn
         |   FROM $src) WHERE rn <= $lim""".stripMargin
    val bks = (0 until initSeeds).map { j =>
      s"""bk$j AS MATERIALIZED (SELECT vec_id,
         |  (('0x' || substr(md5('g$j:' || CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT
         |   & 2147483647) % (SELECT nb FROM nbk) AS b FROM embeddings)""".stripMargin
    }.mkString(",\n")
    // UNION (not ALL) = the engine's union().distinct()
    val ipUnion = (0 until initSeeds).map { j =>
      s"""SELECT a.vec_id AS src, c.vec_id AS dst
         |FROM bk$j a JOIN bk$j c USING (b) WHERE a.vec_id <> c.vec_id""".stripMargin
    }.mkString("\nUNION\n")
    val descent = (1 to rounds).map { r =>
      s"""c$r AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
         |  SELECT src, dst FROM e${r - 1}
         |  UNION ALL SELECT dst AS src, src AS dst FROM e${r - 1}
         |  UNION ALL SELECT a.src, b.dst FROM e${r - 1} a JOIN e${r - 1} b ON a.dst = b.src)
         |  WHERE src <> dst),
         |d$r AS MATERIALIZED (${score(s"c$r", "src", "dst")}),
         |e$r AS MATERIALIZED (${top(s"d$r", "src", "dst", degree)})""".stripMargin
    }.mkString(",\n")
    val search = (1 to hops).map { h =>
      s"""f$h AS MATERIALIZED (${top(s"vis${h - 1}", "qid", "dst", beam)}),
         |n$h AS MATERIALIZED (SELECT DISTINCT f$h.qid, g.dst
         |        FROM f$h JOIN e$rounds g ON g.src = f$h.dst
         |        WHERE NOT EXISTS (SELECT 1 FROM vis${h - 1} vv
         |                          WHERE vv.qid = f$h.qid AND vv.dst = g.dst)),
         |nv$h AS MATERIALIZED (${score(s"n$h", "qid", "dst")}),
         |vis$h AS MATERIALIZED (SELECT * FROM vis${h - 1} UNION ALL SELECT * FROM nv$h)""".stripMargin
    }.mkString(",\n")
    s"""WITH p AS (SELECT vec_id, embedding AS emb,
       |                  unnest(generate_series(1, len(embedding))) AS i
       |           FROM embeddings),
       |v AS MATERIALIZED (SELECT vec_id, CAST(i - 1 AS BIGINT) AS dim,
       |             CAST(FLOOR(CAST(emb[i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS m
       |      FROM p),
       |nbk AS (SELECT GREATEST(1, CAST(FLOOR(COUNT(*) / 8.0) AS BIGINT)) AS nb
       |        FROM embeddings),
       |$bks,
       |ip AS MATERIALIZED ($ipUnion),
       |d0 AS MATERIALIZED (${score("ip", "src", "dst")}),
       |e0 AS MATERIALIZED (${top("d0", "src", "dst", degree)}),
       |$descent,
       |s0 AS (SELECT q.vec_id AS qid, s.vec_id AS dst
       |       FROM embeddings q, embeddings s
       |       WHERE q.vec_id < $nQueries AND s.vec_id < $seeds),
       |vis0 AS MATERIALIZED (${score("s0", "qid", "dst")}),
       |$search
       |SELECT qid AS query_id, CAST(rank AS BIGINT) AS rank,
       |       dst AS neighbor_id, d AS d2
       |FROM (SELECT qid, dst, d,
       |             ROW_NUMBER() OVER (PARTITION BY qid
       |                                ORDER BY d, dst) AS rank
       |      FROM vis$hops WHERE dst <> qid)
       |WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    "q_lookup_enrich" ->
      """SELECT r_name, n_name, COUNT(*) AS n_obs
        |FROM events
        |JOIN customer ON (CASE WHEN user_id = 13 THEN 20 ELSE user_id END) = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,

    "q_time_extract" ->
      """SELECT CAST(ts AS DATE) AS obs_date,
        |       CAST(EXTRACT(hour FROM ts) AS BIGINT) AS obs_hour,
        |       COUNT(*) AS n,
        |       MIN(CAST(EXTRACT(minute FROM ts) AS BIGINT)) AS first_minute
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "q_text_clean" ->
      """WITH s AS (
        |  SELECT doc_id,
        |         lower(replace(replace(text, 'Ã¶', 'ö'), 'Ã¤', 'ä')) AS t
        |  FROM documents)
        |SELECT doc_id,
        |       md5(CASE WHEN strpos(t, 'data') > 0
        |                THEN substr(t, 1, strpos(t, 'data') - 1) || 'datum'
        |                     || substr(t, strpos(t, 'data') + 4)
        |                ELSE t END) AS clean_hash
        |FROM s
        |ORDER BY doc_id""".stripMargin,

    "q_dict_map" ->
      """SELECT lang,
        |       CASE lang
        |         WHEN 'en' THEN 'http://tun.fi/MX.38240'
        |         WHEN 'de' THEN 'http://tun.fi/MX.39158'
        |         WHEN 'fr' THEN 'http://tun.fi/MX.41695'
        |         WHEN 'es' THEN 'http://tun.fi/MX.38947'
        |         WHEN 'zh' THEN 'http://tun.fi/MX.38815'
        |       END AS taxon_uri,
        |       COUNT(*) AS n_docs
        |FROM documents
        |GROUP BY 1, 2
        |ORDER BY lang""".stripMargin,

    "q_control_tags" ->
      """SELECT event_id,
        |       CASE WHEN value > 120.0 THEN CAST(ts AS DATE) END AS control_date,
        |       CASE WHEN value > 120.0 THEN 'INVASIVE_PARTIAL' END AS source_tag,
        |       CASE WHEN value > 120.0
        |            THEN 'Controlled: ' || CAST(CAST(ts AS DATE) AS VARCHAR) END AS notes
        |FROM events
        |ORDER BY event_id""".stripMargin,

    "q_geo_area" ->
      """SELECT l_orderkey,
        |       CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |       CAST(CEIL(l_quantity * (1.0 + l_discount)) AS BIGINT) AS area_m2
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    // make_valid parity: the engine runs the general even-odd
    // decomposition kernel; the oracle knows the closed form for this
    // defect population (crossed rect -> two triangles = w*h/2, 2
    // pieces). The crossing parameter is exactly 0.5 in IEEE754, so
    // both sides' doubles agree bit-for-bit before the ceil.
    "q_geo_valid" ->
      """SELECT l_orderkey,
        |       CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |       CAST(CEIL(CASE WHEN l_orderkey % 2 = 0
        |                      THEN l_quantity * (1.0 + l_discount) / 2
        |                      ELSE l_quantity * (1.0 + l_discount) END) AS BIGINT) AS area_m2,
        |       CAST(CASE WHEN l_orderkey % 2 = 0 THEN 2 ELSE 1 END AS BIGINT) AS pieces
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    // Chamberlain–Duquette spherical excess, term-for-term: the four
    // edge terms appear in Spark's fold order (two are exact zeros from
    // the axis-aligned quad), so the double arithmetic is identical
    // before the final ceil-to-m² guard.
    "q_geo_area_sph" ->
      """WITH g AS (
        |  SELECT l_orderkey, l_linenumber,
        |         24.93 + l_quantity * 0.001 AS lonw,
        |         60.17 + (1.0 + l_discount) * 0.001 AS lath
        |  FROM lineitem)
        |SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |       CAST(CEIL(ABS(
        |           (radians(lonw) - radians(24.93)) * (sin(radians(60.17)) + sin(radians(60.17)))
        |         + (radians(lonw) - radians(lonw)) * (sin(radians(60.17)) + sin(radians(lath)))
        |         + (radians(24.93) - radians(lonw)) * (sin(radians(lath)) + sin(radians(lath)))
        |         + (radians(24.93) - radians(24.93)) * (sin(radians(lath)) + sin(radians(60.17)))
        |       ) * (6371008.8 * 6371008.8 / 2.0)) AS BIGINT) AS area_m2
        |FROM g
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_mint_ids" ->
      """SELECT event_id,
        |       'http://tun.fi/HR.5835/' || CAST(event_id AS VARCHAR) AS document_id,
        |       'http://tun.fi/HR.5835/' || CAST(event_id AS VARCHAR) || '_G' AS gathering_id,
        |       'http://tun.fi/HR.5835/' || CAST(event_id AS VARCHAR) || '_U' AS unit_id
        |FROM events
        |ORDER BY event_id""".stripMargin,

    "q_keywords" ->
      """SELECT event_id,
        |       CAST(event_id AS VARCHAR) || ',crowdsorsa-' || n_name AS keywords
        |FROM events
        |JOIN customer ON (CASE WHEN user_id = 13 THEN 20 ELSE user_id END) = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY event_id""".stripMargin,

    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE) AS sum_base_price,
        |  CAST($SumDisc AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2))
        |           * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
        |           * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(9,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_shipping" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
        |       CAST($SumDisc AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,

    "q5_local" ->
      s"""SELECT n_name, CAST($SumDisc AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '2002-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    "q_topk_group" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |                                 ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        |  FROM orders) x
        |WHERE rn <= 5
        |ORDER BY o_orderpriority, rn""".stripMargin,

    "q_window_running" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(9,2)))
        |       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_spend,
        |  LAG(o_totalprice) OVER (PARTITION BY o_custkey
        |                          ORDER BY o_orderdate, o_orderkey) AS prev_price,
        |  CAST(RANK() OVER (PARTITION BY o_custkey
        |                    ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS price_rank
        |FROM orders
        |WHERE o_custkey < 100
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,

    "q_rollup" ->
      """SELECT o_orderpriority, o_orderstatus,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(9,2))) AS DOUBLE) AS sum_price,
        |       COUNT(*) AS n_orders
        |FROM orders
        |GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
        |ORDER BY o_orderpriority ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""".stripMargin,

    "q_pivot" ->
      """SELECT user_id,
        |       COUNT(*) FILTER (WHERE event_type = 'click')    AS n_click,
        |       COUNT(*) FILTER (WHERE event_type = 'view')     AS n_view,
        |       COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
        |       COUNT(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
        |       COUNT(*) FILTER (WHERE event_type = 'error')    AS n_error
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    "q_json_extract" ->
      """SELECT event_type,
        |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
        |       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max,
        |       COUNT(*) AS n
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q_distinct" ->
      """SELECT event_type,
        |       COUNT(DISTINCT user_id) AS n_users,
        |       COUNT(*) AS n_events
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q_percentile" ->
      """SELECT event_type,
        |       quantile_cont(value, 0.25) AS p25,
        |       quantile_cont(value, 0.5)  AS p50,
        |       quantile_cont(value, 0.75) AS p75
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    // not DuckDB's ASOF (its tie pick among equal click_ts is arbitrary):
    // an explicit row_number spells out the same deterministic choice the
    // Spark operator makes — latest click_ts, then greatest click_id
    "q_asof_join" ->
      """WITH p AS (
        |  SELECT user_id, event_id AS purchase_id, ts AS p_ts, value AS purchase_value
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id, event_id AS click_id, ts AS click_ts
        |  FROM events WHERE event_type = 'click'),
        |j AS (
        |  SELECT p.purchase_id, p.user_id, p.purchase_value, c.click_id, c.click_ts,
        |         row_number() OVER (PARTITION BY p.purchase_id
        |                            ORDER BY c.click_ts DESC, c.click_id DESC) AS rn
        |  FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.click_ts <= p.p_ts)
        |SELECT purchase_id, user_id, purchase_value, click_id, click_ts
        |FROM j WHERE rn = 1
        |ORDER BY purchase_id""".stripMargin,

    "q_sessionize" ->
      """WITH x AS (
        |  SELECT user_id, ts, event_id,
        |         CASE WHEN LAG(ts) OVER w IS NULL
        |                OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
        |              THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), y AS (
        |  SELECT user_id, ts,
        |         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
        |  FROM x)
        |SELECT user_id, session_idx, COUNT(*) AS n_events,
        |       MIN(ts) AS session_start, MAX(ts) AS session_end
        |FROM y
        |GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,

    "q_langid" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split(text,' '), t -> t IN ('the','and','of','to','a')))   AS score_en,
        |    len(list_filter(string_split(text,' '), t -> t IN ('der','die','das','und','ist'))) AS score_de,
        |    len(list_filter(string_split(text,' '), t -> t IN ('el','los','y','que','en')))   AS score_es,
        |    len(list_filter(string_split(text,' '), t -> t IN ('le','les','et','des','un')))  AS score_fr,
        |    len(list_filter(string_split(text,' '), t -> t IN ('de','shi','le','wo','ni')))   AS score_zh
        |  FROM documents)
        |SELECT doc_id, score_en, score_de, score_es, score_fr, score_zh,
        |  CASE
        |    WHEN score_en >= score_de AND score_en >= score_es AND score_en >= score_fr AND score_en >= score_zh THEN 'en'
        |    WHEN score_de >= score_es AND score_de >= score_fr AND score_de >= score_zh THEN 'de'
        |    WHEN score_es >= score_fr AND score_es >= score_zh THEN 'es'
        |    WHEN score_fr >= score_zh THEN 'fr'
        |    ELSE 'zh'
        |  END AS pred_lang
        |FROM s
        |ORDER BY doc_id""".stripMargin,

    "q_quality" ->
      """SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS n_chars_m,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE)
        |    / length(text) AS punct_ratio,
        |  CAST(len(list_filter(string_split(text, ' '),
        |           t -> t IN ('the','and','of','to','a'))) AS DOUBLE)
        |    / len(string_split(text, ' ')) AS stopword_ratio,
        |  CAST(length(text) AS DOUBLE) / len(string_split(text, ' ')) AS mean_token_len
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "q_tokens" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')) AS BIGINT) AS bpe_tokens
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    // integer bit-length entropy proxy: cost = Σ c·(bitlen(n)−bitlen(c))
    // over the per-char histogram — every term exact BIGINT, replayed
    // with list HOFs (list_distinct order is irrelevant: the sum is
    // order-free)
    "q_char_entropy" ->
      """WITH c AS (SELECT doc_id, string_split(text, '') AS chs
        |           FROM documents WHERE length(text) > 0),
        |k AS (SELECT doc_id, chs, len(chs) AS n, list_distinct(chs) AS uq FROM c),
        |e AS (SELECT doc_id, n, len(uq) AS distinct_chars,
        |        list_sum(list_transform(
        |          list_transform(uq, ch -> len(list_filter(chs, x -> x = ch))),
        |          cc -> cc * (length(bin(n)) - length(bin(cc))))) AS cost_units
        |      FROM k)
        |SELECT doc_id,
        |  CAST(n AS BIGINT) AS n_chars_h,
        |  CAST(distinct_chars AS BIGINT) AS distinct_chars,
        |  CAST(cost_units AS BIGINT) AS cost_units,
        |  CAST(cost_units * 1000000 // n AS BIGINT) AS entropy_ppm
        |FROM e ORDER BY doc_id""".stripMargin,

    "q_fingerprint" ->
      """SELECT doc_id,
        |       md5(trim(regexp_replace(lower(text), ' +', ' ', 'g'))) AS fp
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "q_dedup_exact" ->
      """SELECT MIN(doc_id) AS survivor_id, md5(text) AS content_hash,
        |       COUNT(*) AS n_copies
        |FROM documents
        |GROUP BY md5(text)
        |ORDER BY survivor_id""".stripMargin,

    "q_ngram_jaccard" ->
      """WITH g AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(range(1, len(string_split(text, ' '))),
        |           i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS grams
        |  FROM documents)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
        |         / len(list_distinct(list_concat(a.grams, b.grams))) AS jaccard
        |FROM g a JOIN g b ON b.doc_id > a.doc_id AND b.doc_id <= a.doc_id + 5
        |WHERE a.doc_id % 10 = 0
        |ORDER BY doc_a, doc_b""".stripMargin,

    // PPJoin replayed stage-for-stage: df-ordered prefix, candidate
    // equi-join with the integer length filter, exact-intersection
    // verify with the integer Jaccard test (t = 9/10)
    "q_setjoin_prefix" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |pos0 AS (SELECT doc_id, l, unnest(generate_series(1, len(l) - 1)) AS i FROM w),
        |tok AS (SELECT DISTINCT doc_id, l[i] || ' ' || l[i+1] AS w FROM pos0),
        |df AS (SELECT w, COUNT(*) AS df FROM tok GROUP BY 1),
        |sz AS (SELECT doc_id, COUNT(*) AS s FROM tok GROUP BY 1),
        |pos AS (SELECT t.doc_id, t.w, sz.s,
        |          ROW_NUMBER() OVER (PARTITION BY t.doc_id
        |            ORDER BY df.df, t.w) AS p
        |        FROM tok t JOIN df ON t.w = df.w JOIN sz ON t.doc_id = sz.doc_id),
        |pref AS (SELECT * FROM pos WHERE p <= s - (9 * s + 9) // 10 + 1),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |         FROM pref a JOIN pref b ON a.w = b.w AND a.doc_id < b.doc_id
        |           AND 10 * b.s >= 9 * a.s AND 10 * a.s >= 9 * b.s),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
        |          FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id
        |          JOIN cand c ON c.doc_a = a.doc_id AND c.doc_b = b.doc_id
        |          GROUP BY 1, 2)
        |SELECT inter.doc_a, inter.doc_b, CAST(i AS BIGINT) AS inter,
        |  CAST(sa.s AS BIGINT) AS sa, CAST(sb.s AS BIGINT) AS sb,
        |  CAST(i * 1000000 // (sa.s + sb.s - i) AS BIGINT) AS jac_ppm
        |FROM inter
        |JOIN sz sa ON sa.doc_id = inter.doc_a
        |JOIN sz sb ON sb.doc_id = inter.doc_b
        |WHERE 10 * i >= 9 * (sa.s + sb.s - i)
        |ORDER BY doc_a, doc_b""".stripMargin,

    // Full MinHash+LSH pipeline, reproduced integer-for-integer: the
    // md5-derived 31-bit shingle hash, the universal-family signature
    // (same (a,b) constants, baked into the VALUES list below from the
    // same seeded RNG), the band equi-join, and the exact-Jaccard
    // verify. DuckDB's `('0x'||substr(md5(g),1,8))::BIGINT` equals
    // Spark's `conv(substring(md5(g),1,8),16,10)` by construction.
    "q_dedup_minhash" ->
      s"""$minhashOracleCore
         |SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,

    // the giant-bucket guard: pairwise candidate generation skips band
    // buckets holding more than 2 docs (the boilerplate-explosion cap);
    // the oracle rebuilds the identical bucket-size filter from the
    // shared band-key CTE before the self-join
    "q_dedup_minhash_cap" ->
      s"""WITH ${minhashSigCtes("documents")},
         |bsz AS (SELECT band, key FROM bk GROUP BY band, key HAVING COUNT(*) <= 2),
         |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |         FROM bk x JOIN bsz s ON x.band = s.band AND x.key = s.key
         |                   JOIN bk y ON x.band = y.band AND x.key = y.key
         |            AND x.doc_id < y.doc_id),
         |j AS (SELECT c.doc_a, c.doc_b,
         |        CAST(len(list_intersect(xa.gs, yb.gs)) AS DOUBLE)
         |          / (len(xa.gs) + len(yb.gs) - len(list_intersect(xa.gs, yb.gs))) AS jaccard
         |      FROM cand c JOIN gl xa ON xa.doc_id = c.doc_a
         |                  JOIN gl yb ON yb.doc_id = c.doc_b)
         |SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,

    // one-permutation MinHash: bin routing, per-bin minima, rotation
    // densification (m + d·P31), band join and exact-Jaccard verify —
    // all replayed integer-for-integer
    "q_dedup_minhash_oph" ->
      s"""WITH ${ophCoreCtes("documents")}
         |SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,

    // overlap coefficient |A∩B|/min(|A|,|B|) over the classic md5 LSH
    // candidate set — the doc-inside-doc verify predicate
    "q_containment" ->
      s"""WITH ${minhashSigCtes("documents")},
         |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |         FROM bk x JOIN bk y
         |           ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id),
         |j AS (SELECT c.doc_a, c.doc_b,
         |        CAST(len(list_intersect(xa.gs, yb.gs)) AS DOUBLE)
         |          / least(len(xa.gs), len(yb.gs)) AS overlap
         |      FROM cand c JOIN gl xa ON xa.doc_id = c.doc_a
         |                  JOIN gl yb ON yb.doc_id = c.doc_b)
         |SELECT doc_a, doc_b, overlap FROM j WHERE overlap >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,

    // asymmetric batch-vs-index probe over the same signature CTEs
    "q_dedup_incremental" ->
      s"""WITH ${minhashSigCtes("documents")},
         |cand AS (SELECT DISTINCT x.doc_id AS new_doc, y.doc_id AS dup_of
         |         FROM bk x JOIN bk y
         |           ON x.band = y.band AND x.key = y.key
         |         WHERE x.doc_id % 10 = 0 AND y.doc_id % 10 <> 0),
         |j AS (SELECT c.new_doc, c.dup_of,
         |        CAST(len(list_intersect(xa.gs, yb.gs)) AS DOUBLE)
         |          / (len(xa.gs) + len(yb.gs) - len(list_intersect(xa.gs, yb.gs))) AS jaccard
         |      FROM cand c JOIN gl xa ON xa.doc_id = c.new_doc
         |                  JOIN gl yb ON yb.doc_id = c.dup_of)
         |SELECT new_doc, dup_of, jaccard FROM j WHERE jaccard >= 0.5
         |ORDER BY new_doc, dup_of""".stripMargin,

    // the pair graph above closed into clusters: recursive-CTE label
    // propagation mirrors the Spark pointer-jumping loop exactly
    "q_dedup_clusters" ->
      s"""${minhashOracleCore.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |pairs AS (SELECT doc_a AS a, doc_b AS b FROM j WHERE jaccard >= 0.5),
         |sym AS (SELECT a AS src, b AS dst FROM pairs
         |        UNION ALL SELECT b AS src, a AS dst FROM pairs),
         |reach(node, lbl) AS (
         |  SELECT DISTINCT src AS node, src AS lbl FROM sym
         |  UNION
         |  SELECT s.src, r.lbl FROM sym s JOIN reach r ON s.dst = r.node),
         |cc AS (SELECT node, MIN(lbl) AS cluster_id FROM reach GROUP BY node)
         |SELECT node AS doc_id, cluster_id,
         |       COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
         |FROM cc
         |ORDER BY doc_id""".stripMargin,

    // the cluster closure above turned into SoftDeDup sampling weights:
    // every document keeps weight 1e6 // its near-dup cluster size
    "q_soft_dedup" ->
      s"""${minhashOracleCore.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |pairs AS (SELECT doc_a AS a, doc_b AS b FROM j WHERE jaccard >= 0.5),
         |sym AS (SELECT a AS src, b AS dst FROM pairs
         |        UNION ALL SELECT b AS src, a AS dst FROM pairs),
         |reach(node, lbl) AS (
         |  SELECT DISTINCT src AS node, src AS lbl FROM sym
         |  UNION
         |  SELECT s.src, r.lbl FROM sym s JOIN reach r ON s.dst = r.node),
         |cc AS (SELECT node, MIN(lbl) AS cluster_id FROM reach GROUP BY node),
         |cs AS (SELECT node AS doc_id,
         |              COUNT(*) OVER (PARTITION BY cluster_id) AS csz FROM cc)
         |SELECT d.doc_id,
         |       CAST(COALESCE(cs.csz, 1) AS BIGINT) AS cluster_size,
         |       CAST(1000000 // COALESCE(cs.csz, 1) AS BIGINT) AS weight_ppm
         |FROM documents d LEFT JOIN cs ON d.doc_id = cs.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    // signature-estimate vs exact-Jaccard audit over the shipped pairs;
    // DuckDB recomputes both from the shared md5 signature/shingle CTEs
    "q_lsh_audit" ->
      s"""$minhashOracleCore,
         |vp AS (SELECT doc_a, doc_b FROM j WHERE jaccard >= 0.5),
         |est AS (SELECT v.doc_a, v.doc_b,
         |          CAST(SUM(CASE WHEN sa.m = sb.m THEN 1 ELSE 0 END)
         |               * 1000000 // 32 AS BIGINT) AS est_ppm
         |        FROM vp v JOIN sig sa ON sa.doc_id = v.doc_a
         |                  JOIN sig sb ON sb.doc_id = v.doc_b AND sb.i = sa.i
         |        GROUP BY v.doc_a, v.doc_b),
         |ex AS (SELECT v.doc_a, v.doc_b,
         |         CAST(len(list_intersect(ga.gs, gb.gs)) AS BIGINT) * 1000000
         |           // (len(ga.gs) + len(gb.gs) - len(list_intersect(ga.gs, gb.gs)))
         |           AS exact_ppm
         |       FROM vp v JOIN gl ga ON ga.doc_id = v.doc_a
         |                 JOIN gl gb ON gb.doc_id = v.doc_b)
         |SELECT e.doc_a, e.doc_b, est.est_ppm, e.exact_ppm,
         |       est.est_ppm - e.exact_ppm AS err_ppm
         |FROM ex e JOIN est ON est.doc_a = e.doc_a AND est.doc_b = e.doc_b
         |ORDER BY e.doc_a, e.doc_b""".stripMargin,

    // Lee-et-al-style exact duplicated-passage removal: any token
    // covered by a corpus-repeated 10-gram is removed except the
    // globally-first occurrence (MIN doc_id*1e6+pos keeper)
    "q_substr_dedup" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |p AS (SELECT doc_id, l, unnest(generate_series(1, len(l))) AS i FROM tok),
        |g AS (SELECT doc_id, i, md5(array_to_string(l[i:i+9], ' ')) AS h
        |      FROM p WHERE i + 9 <= len(l)),
        |d AS (SELECT h, COUNT(*) AS c,
        |             MIN(doc_id * 1000000 + i) AS keep
        |      FROM g GROUP BY h HAVING COUNT(*) > 1),
        |cov AS (SELECT DISTINCT g.doc_id,
        |               unnest(generate_series(g.i, g.i + 9)) AS ci
        |        FROM g JOIN d ON g.h = d.h
        |        WHERE g.doc_id * 1000000 + g.i <> d.keep),
        |kept AS (SELECT p.doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
        |                string_agg(p.l[p.i], ' ' ORDER BY p.i) AS cleaned
        |         FROM p LEFT JOIN cov
        |           ON p.doc_id = cov.doc_id AND p.i = cov.ci
        |         WHERE cov.ci IS NULL
        |         GROUP BY p.doc_id)
        |SELECT t.doc_id, CAST(len(t.l) AS BIGINT) AS n_tok,
        |       CAST(len(t.l) AS BIGINT) - COALESCE(kept.n_kept, 0) AS n_removed,
        |       COALESCE(kept.cleaned, '') AS cleaned
        |FROM tok t LEFT JOIN kept ON t.doc_id = kept.doc_id
        |ORDER BY t.doc_id""".stripMargin,

    // gaps-and-islands merge of the same duplicated-gram spans: the
    // interval-endpoint twin of q_substr_dedup's position explosion
    "q_span_islands" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |p AS (SELECT doc_id, l, unnest(generate_series(1, len(l))) AS i FROM tok),
        |g AS (SELECT doc_id, i, md5(array_to_string(l[i:i+9], ' ')) AS h
        |      FROM p WHERE i + 9 <= len(l)),
        |d AS (SELECT h, COUNT(*) AS c,
        |             MIN(doc_id * 1000000 + i) AS keep
        |      FROM g GROUP BY h HAVING COUNT(*) > 1),
        |sp AS (SELECT g.doc_id, g.i AS s, g.i + 9 AS e
        |       FROM g JOIN d ON g.h = d.h
        |       WHERE g.doc_id * 1000000 + g.i <> d.keep),
        |mx AS (SELECT doc_id, s, e,
        |         MAX(e) OVER (PARTITION BY doc_id ORDER BY s
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |           AS prev_max
        |       FROM sp),
        |isl AS (SELECT doc_id, s, e,
        |          SUM(CASE WHEN prev_max IS NULL OR s > prev_max
        |                   THEN 1 ELSE 0 END)
        |            OVER (PARTITION BY doc_id ORDER BY s) AS island
        |        FROM mx),
        |agg AS (SELECT doc_id, island, COUNT(*) AS nsp,
        |               MIN(s) AS i_s, MAX(e) AS i_e
        |        FROM isl GROUP BY doc_id, island)
        |SELECT doc_id, CAST(SUM(nsp) AS BIGINT) AS n_spans,
        |       CAST(COUNT(*) AS BIGINT) AS n_islands,
        |       CAST(SUM(i_e - i_s + 1) AS BIGINT) AS covered_tok
        |FROM agg GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    // near-dup pairs rolled up by unordered source pair
    "q_source_dup_matrix" ->
      s"""$minhashOracleCore,
         |vp AS (SELECT doc_a, doc_b FROM j WHERE jaccard >= 0.5),
         |lab AS (SELECT da.source AS src_a, db.source AS src_b
         |        FROM vp v JOIN documents da ON da.doc_id = v.doc_a
         |                  JOIN documents db ON db.doc_id = v.doc_b)
         |SELECT least(src_a, src_b) AS source_a,
         |       greatest(src_a, src_b) AS source_b,
         |       CAST(COUNT(*) AS BIGINT) AS n_pairs
         |FROM lab GROUP BY 1, 2
         |ORDER BY n_pairs DESC, source_a, source_b""".stripMargin,

    // fixed-iteration integer PageRank over the same pair graph; the
    // recursive CTE replays the identical bigint floor arithmetic
    "q_pagerank" ->
      s"""${minhashOracleCore.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |pairs AS (SELECT doc_a AS a, doc_b AS b FROM j WHERE jaccard >= 0.5),
         |edges AS (SELECT a AS src, b AS dst FROM pairs
         |          UNION ALL SELECT b AS src, a AS dst FROM pairs),
         |deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
         |nodes AS (SELECT DISTINCT src AS node FROM edges),
         |pr(iter, node, p) AS (
         |  SELECT 0, node, CAST(1000000 AS BIGINT) FROM nodes
         |  UNION ALL
         |  SELECT pr.iter + 1, e.dst,
         |         CAST(150000 + 850 * SUM(pr.p // d.d) // 1000 AS BIGINT)
         |  FROM pr JOIN edges e ON pr.node = e.src
         |          JOIN deg d ON pr.node = d.src
         |  WHERE pr.iter < 5
         |  GROUP BY pr.iter, e.dst)
         |SELECT node AS doc_id, p AS pagerank_ppm FROM pr WHERE iter = 5
         |ORDER BY doc_id""".stripMargin,

    // degree-ordered orientation replayed literally: the oracle builds
    // the same (deg, id)-ordered DAG, so each triangle is produced once
    // at its apex in both engines and the per-corner credit matches
    "q_triangles" ->
      """WITH e AS (
        |  SELECT a.l_partkey AS a, b.l_partkey AS b
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND b.l_partkey > a.l_partkey
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |deg AS (SELECT node, COUNT(*) AS deg FROM (
        |          SELECT a AS node FROM e UNION ALL SELECT b FROM e)
        |        GROUP BY 1),
        |o AS (SELECT
        |        CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e.a < e.b)
        |             THEN e.a ELSE e.b END AS u,
        |        CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e.a < e.b)
        |             THEN e.b ELSE e.a END AS v,
        |        CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e.a < e.b)
        |             THEN db.deg ELSE da.deg END AS dv
        |      FROM e JOIN deg da ON da.node = e.a
        |             JOIN deg db ON db.node = e.b),
        |tri AS (SELECT e1.u AS x, e1.v AS y, e2.v AS z
        |        FROM o e1 JOIN o e2 ON e1.u = e2.u
        |          AND (e1.dv < e2.dv OR (e1.dv = e2.dv AND e1.v < e2.v))
        |        JOIN o e3 ON e3.u = e1.v AND e3.v = e2.v)
        |SELECT node AS part_id, CAST(COUNT(*) AS BIGINT) AS n_tri FROM (
        |  SELECT x AS node FROM tri
        |  UNION ALL SELECT y FROM tri
        |  UNION ALL SELECT z FROM tri)
        |GROUP BY 1
        |ORDER BY n_tri DESC, part_id""".stripMargin,

    // 60-bit md5-nibble SimHash; the oracle brute-forces all pairs —
    // pigeonhole (hamming ≤ 3 over 4 chunks) proves the Spark side's
    // chunk-bucketed join returns the identical set.
    "q_dedup_simhash" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tk FROM documents),
        |tkh AS (SELECT doc_id, md5(tk) AS m FROM tok),
        |bits AS (SELECT doc_id, j,
        |           CASE WHEN ((strpos('0123456789abcdef', substr(m, (j // 4) + 1, 1)) - 1)
        |                      >> (j % 4)) & 1 = 1 THEN 1 ELSE -1 END AS v
        |         FROM tkh CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS j) js),
        |s AS (SELECT doc_id, j, SUM(v) AS sv FROM bits GROUP BY doc_id, j),
        |fp AS (SELECT doc_id,
        |              CAST(SUM(CASE WHEN sv > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS fp
        |       FROM s GROUP BY doc_id)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
        |FROM fp a JOIN fp b ON b.doc_id > a.doc_id
        |WHERE bit_count(xor(a.fp, b.fp)) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin,

    "q_knn_cosine" ->
      """WITH pairs AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |         list_cosine_similarity(q.embedding, c.embedding) AS sim
        |  FROM embeddings q, embeddings c
        |  WHERE q.vec_id < 10 AND c.vec_id != q.vec_id)
        |SELECT query_id, rank, neighbor_id FROM (
        |  SELECT query_id, neighbor_id,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
        |                                 ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rank
        |  FROM pairs) x
        |WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    "q_doc_assembly" ->
      """WITH ev AS (
        |  SELECT *, CAST(FLOOR(value*100.0 + 0.5) AS BIGINT) AS vc FROM events),
        |gm AS (
        |  SELECT *, 24930000 + vc*10 AS lonw, 60171000 + vc*5 AS lath FROM ev),
        |se AS (
        |  SELECT *,
        |    printf('%d.%06d', lonw // 1000000, lonw % 1000000) AS lonws,
        |    printf('%d.%06d', lath // 1000000, lath % 1000000) AS laths
        |  FROM gm)
        |SELECT event_id,
        |  '{"schema":"laji-etl","sourceId":"http://tun.fi/KE.1721","collectionId":"http://tun.fi/HR.5835","documentId":"http://tun.fi/HR.5835/'
        |  || CAST(event_id AS VARCHAR)
        |  || '","publicDocument":{"concealment":"PUBLIC","keywords":["'
        |  || CAST(event_id AS VARCHAR) || '","crowdsorsa-' || n_name || '"]'
        |  || CASE WHEN value > 120.0
        |       THEN ',"notes":"Controlled: ' || CAST(CAST(ts AS DATE) AS VARCHAR) || '"'
        |       ELSE '' END
        |  || ',"gatherings":[{"gatheringId":"http://tun.fi/HR.5835/'
        |  || CAST(event_id AS VARCHAR) || '_G","eventDate":{"begin":"'
        |  || CAST(CAST(ts AS DATE) AS VARCHAR) || '","end":"'
        |  || CAST(CAST(ts AS DATE) AS VARCHAR)
        |  || '"},"hourBegin":' || CAST(EXTRACT(hour FROM ts) AS VARCHAR)
        |  || ',"hourEnd":' || CAST(EXTRACT(hour FROM ts) AS VARCHAR)
        |  || ',"minuteBegin":' || CAST(EXTRACT(minute FROM ts) AS VARCHAR)
        |  || ',"minuteEnd":' || CAST(EXTRACT(minute FROM ts) AS VARCHAR)
        |  || ',"municipality":"' || n_name
        |  || '","geo":{"type":"FeatureCollection","crs":"WGS84","features":[{"type":"Feature","geometry":{"type":"Polygon","coordinates":[['
        |  || '[24.930000,60.170000],[' || lonws || ',60.170000],['
        |  || lonws || ',' || laths || '],[24.930000,' || laths || ']'
        |  || CASE WHEN CEIL(value - 100.0) > 0 THEN ',[24.930000,60.170000]' ELSE '' END
        |  || ']]}}]},"units":[{"unitId":"http://tun.fi/HR.5835/'
        |  || CAST(event_id AS VARCHAR) || '_U","taxonVerbatim":"' || event_type || '"'
        |  || CASE WHEN event_type = 'purchase' THEN ',"reportedTaxonId":"http://tun.fi/MX.38947"'
        |          WHEN event_type = 'click'    THEN ',"reportedTaxonId":"http://tun.fi/MX.38240"'
        |          WHEN event_type = 'view'     THEN ',"reportedTaxonId":"http://tun.fi/MX.38815"'
        |          WHEN event_type = 'signup'   THEN ',"reportedTaxonId":"http://tun.fi/MX.41695"'
        |          ELSE '' END
        |  || ',"sourceTags":' || CASE WHEN value > 120.0 THEN '["INVASIVE_PARTIAL"]' ELSE '[]' END
        |  || CASE WHEN CEIL(value - 100.0) > 0
        |       THEN ',"facts":[{"fact":"http://tun.fi/MY.areaInSquareMeters","integerValue":'
        |            || CAST(CAST(CEIL(value - 100.0) AS BIGINT) AS VARCHAR)
        |            || ',"value":"' || CAST(CAST(CEIL(value - 100.0) AS BIGINT) AS VARCHAR) || '"}]'
        |       ELSE '' END
        |  || '}]}]}}' AS doc
        |FROM se
        |JOIN customer ON (CASE WHEN user_id = 13 THEN 20 ELSE user_id END) = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY event_id""".stripMargin,

    "q_doc_assembly24" ->
      """WITH ev AS (
        |  SELECT *, CAST(FLOOR(value*100.0 + 0.5) AS BIGINT) AS vc FROM events),
        |se AS (
        |  SELECT *,
        |    CAST(385000 + vc AS VARCHAR) AS xs,
        |    CAST(6672100 + vc*2 AS VARCHAR) AS ys
        |  FROM ev)
        |SELECT event_id,
        |  '{"schema":"laji-etl","sourceId":"http://tun.fi/KE.1721","collectionId":"http://tun.fi/HR.5835","documentId":"http://tun.fi/HR.5835/'
        |  || CAST(event_id AS VARCHAR)
        |  || '","publicDocument":{"concealment":"PUBLIC","keywords":["'
        |  || CAST(event_id AS VARCHAR) || '","crowdsorsa-' || n_name || '"]'
        |  || CASE WHEN value > 120.0
        |       THEN ',"notes":"Controlled: ' || CAST(CAST(ts AS DATE) AS VARCHAR) || '"'
        |       ELSE '' END
        |  || ',"gatherings":[{"gatheringId":"http://tun.fi/HR.5835/'
        |  || CAST(event_id AS VARCHAR) || '_G","eventDate":{"begin":"'
        |  || CAST(CAST(ts AS DATE) AS VARCHAR) || '","end":"'
        |  || CAST(CAST(ts AS DATE) AS VARCHAR)
        |  || '"},"municipality":"' || n_name
        |  || '","geo":{"type":"FeatureCollection","crs":"EUREF","features":[{"type":"Feature","geometry":{"type":"Polygon","coordinates":[['
        |  || '[385000,6672000],[' || xs || ',6672000],['
        |  || xs || ',' || ys || '],[385000,' || ys || '],[385000,6672000]'
        |  || ']]}}]},"units":[{"unitId":"http://tun.fi/HR.5835/'
        |  || CAST(event_id AS VARCHAR) || '_U","taxonVerbatim":"' || event_type || '"'
        |  || CASE WHEN event_type = 'purchase' THEN ',"reportedTaxonId":"http://tun.fi/MX.38947"'
        |          WHEN event_type = 'click'    THEN ',"reportedTaxonId":"http://tun.fi/MX.38240"'
        |          WHEN event_type = 'view'     THEN ',"reportedTaxonId":"http://tun.fi/MX.38815"'
        |          WHEN event_type = 'signup'   THEN ',"reportedTaxonId":"http://tun.fi/MX.41695"'
        |          ELSE '' END
        |  || ',"sourceTags":' || CASE WHEN value > 120.0 THEN '["INVASIVE_PARTIAL"]' ELSE '[]' END
        |  || ',"abundanceString":"' || printf('%.2f', value)
        |  || '","abundanceUnit":"RELATIVE_DENSITY","facts":[{"fact":"http://tun.fi/MY.areaInSquareMeters","integerValue":'
        |  || CAST(CAST(GREATEST(CEIL(value - 100.0), 1.0) AS BIGINT) AS VARCHAR)
        |  || ',"value":"' || CAST(CAST(GREATEST(CEIL(value - 100.0), 1.0) AS BIGINT) AS VARCHAR)
        |  || '"}]}]}]}}' AS doc
        |FROM se
        |JOIN customer ON (CASE WHEN user_id = 13 THEN 20 ELSE user_id END) = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY event_id""".stripMargin,

    "q_push_log" ->
      """WITH x AS (
        |  SELECT event_id,
        |         CASE WHEN event_id % 97 = 0 THEN 500 ELSE 200 END AS status,
        |         replace('POST /v0/warehouse/push?access_token=SECRET123 doc=http://tun.fi/HR.5835/'
        |                 || CAST(event_id AS VARCHAR), 'SECRET123', '') AS logline
        |  FROM events)
        |SELECT CAST(status AS BIGINT) AS status, COUNT(*) AS n_docs,
        |       bool_and(strpos(logline, 'SECRET123') = 0) AS all_redacted
        |FROM x
        |GROUP BY status
        |ORDER BY status""".stripMargin,

    "q_session_window" ->
      """WITH m AS (SELECT user_id, ts,
        |    CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |          OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |             >= INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |g AS (SELECT user_id, ts,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                   ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m)
        |SELECT user_id, MIN(ts) AS s_start,
        |       MAX(ts) + INTERVAL 30 MINUTE AS s_end,
        |       CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM g GROUP BY user_id, sid
        |ORDER BY user_id, s_start""".stripMargin,

    "q_stream_window" ->
      """SELECT date_trunc('hour', ts) AS win_start, event_type, COUNT(*) AS n
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY win_start, event_type""".stripMargin,

    "q_multimodal_meta" ->
      """SELECT doc_id,
        |       CAST(octet_length(unhex(md5(text))) AS BIGINT) AS n_bytes,
        |       'image/fake' AS format,
        |       CAST(doc_id % 64 + 16 AS BIGINT) AS width,
        |       CAST(doc_id % 48 + 12 AS BIGINT) AS height
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "q_semi_anti" ->
      """SELECT c_mktsegment,
        |  COUNT(*) FILTER (WHERE EXISTS
        |    (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS n_with,
        |  COUNT(*) FILTER (WHERE NOT EXISTS
        |    (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS n_without
        |FROM customer
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "q_setops" ->
      """SELECT
        |  (SELECT COUNT(*) FROM (
        |     SELECT DISTINCT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995
        |     INTERSECT
        |     SELECT DISTINCT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996)) AS n_both,
        |  (SELECT COUNT(*) FROM (
        |     SELECT DISTINCT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995
        |     EXCEPT
        |     SELECT DISTINCT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996)) AS n_only_95,
        |  (SELECT COUNT(*) FROM (
        |     SELECT DISTINCT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995
        |     UNION
        |     SELECT DISTINCT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996)) AS n_union""".stripMargin,

    "q_cube" ->
      """WITH o AS (
        |  SELECT o_orderstatus,
        |         CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
        |         o_totalprice
        |  FROM orders)
        |SELECT o_orderstatus, o_year,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(9,2))) AS DOUBLE) AS sum_price,
        |       COUNT(*) AS n
        |FROM o
        |GROUP BY CUBE (o_orderstatus, o_year)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_year ASC NULLS FIRST""".stripMargin,

    "q_string_agg" ->
      """SELECT n_name,
        |       string_agg(s_name, ',' ORDER BY s_name) AS suppliers,
        |       COUNT(*) AS n_sup
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,

    "q_subquery" -> Relational.SubquerySql,

    "q_range_window" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey,
        |         CAST(epoch(o_orderdate) AS BIGINT) AS od_epoch
        |  FROM orders)
        |SELECT o_custkey, o_orderkey,
        |       COUNT(*) OVER (PARTITION BY o_custkey ORDER BY od_epoch
        |                      RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW) AS n_trailing_90d
        |FROM o
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_first_last" ->
      """SELECT o_orderpriority, o_orderkey,
        |       FIRST_VALUE(o_orderkey) OVER w AS first_key,
        |       LAST_VALUE(o_orderkey)  OVER w AS last_key
        |FROM orders
        |WHERE o_custkey < 20
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,

    "q_date_math" ->
      """SELECT o_orderkey,
        |  CAST(o_orderdate AS DATE) AS od,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS due_date,
        |  CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS epoch_days,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |  CAST(quarter(CAST(o_orderdate AS DATE)) AS BIGINT) AS qtr,
        |  CAST(dayofweek(CAST(o_orderdate AS DATE)) AS BIGINT) AS dow,
        |  CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS month_start
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,

    "q_str_funcs" ->
      """SELECT p_partkey,
        |  lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
        |  translate(p_type, 'aeiou', 'AEIOU') AS type_tr,
        |  reverse(p_name) AS name_rev,
        |  CAST(levenshtein(p_brand, 'Brand#11') AS BIGINT) AS lev,
        |  repeat('*', p_size % 5) AS stars,
        |  split_part(p_type, ' ', 2) AS type_mid,
        |  left(p_name, 5) AS name_l
        |FROM part
        |ORDER BY p_partkey""".stripMargin,

    "q_grouping_sets" -> Relational.GroupingSetsSql,

    "q_regex" ->
      """SELECT p_partkey,
        |  regexp_extract(p_type, '^(\w+)', 1) AS type_first,
        |  regexp_extract(p_name, '(\w+)$', 1) AS name_last,
        |  regexp_matches(p_brand, '[0-9]') AS brand_has_digit
        |FROM part
        |ORDER BY p_partkey""".stripMargin,

    "q_ntile" ->
      """WITH x AS (
        |  SELECT o_orderpriority, o_orderkey,
        |         CAST(NTILE(4) OVER (PARTITION BY o_orderpriority
        |                             ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS quartile
        |  FROM orders)
        |SELECT o_orderpriority, quartile, COUNT(*) AS n, MIN(o_orderkey) AS first_key
        |FROM x
        |GROUP BY o_orderpriority, quartile
        |ORDER BY o_orderpriority, quartile""".stripMargin,

    "q_having" ->
      """SELECT o_custkey, COUNT(*) AS n_orders
        |FROM orders
        |GROUP BY o_custkey
        |HAVING COUNT(*) >= 15
        |ORDER BY o_custkey""".stripMargin,

    "q_histogram" ->
      """SELECT CAST(FLOOR(value / 20.0) AS BIGINT) AS bucket, COUNT(*) AS n
        |FROM events
        |GROUP BY 1
        |ORDER BY bucket""".stripMargin,

    "q_null_semantics" ->
      """SELECT o_orderkey,
        |  COALESCE(CASE WHEN o_orderkey % 3 != 0 THEN o_totalprice END, -1.0) AS price_or_default,
        |  NULLIF(o_orderstatus, 'O') AS status_non_open,
        |  (CASE WHEN o_orderkey % 3 != 0 THEN o_totalprice END
        |     IS NOT DISTINCT FROM
        |   CASE WHEN o_orderkey % 5 != 0 THEN o_totalprice END) AS nullsafe_eq,
        |  (CASE WHEN o_orderkey % 3 != 0 THEN o_totalprice END IS NULL) AS was_null
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,

    // jusText-style extraction replay: the page is synthesized from
    // text (nav + script + 10-word <p> chunks, (doc_id+ci)%4==0 fully
    // linked, footer), then the extraction kernel — script strip,
    // block-line split, tag strip, link-density classify — runs as
    // the same regexp/list expressions; 0.5 threshold is the integer
    // cross-product 2*link_words <= words, division-free
    "q_html_extract" ->
      """WITH w AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> length(x) > 0) AS ws
        |  FROM documents),
        |pg AS (SELECT doc_id,
        |    '<div><a href="/">Home</a> <a href="/a">About</a></div>'
        |    || '<script>var x = 1;</script>'
        |    || array_to_string(list_transform(
        |         generate_series(0, greatest((len(ws) + 9) // 10, 1) - 1),
        |         ci -> '<p>' || CASE WHEN (doc_id + ci) % 4 = 0
        |             THEN array_to_string(list_transform(
        |                    list_slice(ws, ci * 10 + 1, ci * 10 + 10),
        |                    x -> '<a href="#">' || x || '</a>'), ' ')
        |             ELSE array_to_string(
        |                    list_slice(ws, ci * 10 + 1, ci * 10 + 10), ' ')
        |           END || '</p>'), '')
        |    || '<div><a href="/tos">Terms</a></div>' AS html
        |  FROM w),
        |ln AS (SELECT doc_id,
        |    string_split_regex(
        |      regexp_replace(html, '<script[^<]*</script>', ' ', 'g'),
        |      '</p>|</div>') AS lines
        |  FROM pg),
        |st AS (SELECT doc_id,
        |    list_transform(lines, l -> {
        |      'txt': trim(regexp_replace(regexp_replace(l, '<[^>]*>', ' ', 'g'),
        |                                 ' +', ' ', 'g')),
        |      'lw': list_sum(list_transform(
        |              regexp_extract_all(l, '<a [^>]*>([^<]*)</a>', 1),
        |              s -> CASE WHEN trim(regexp_replace(s, ' +', ' ', 'g')) = ''
        |                   THEN 0 ELSE len(string_split(
        |                     trim(regexp_replace(s, ' +', ' ', 'g')), ' ')) END))
        |    }) AS sts
        |  FROM ln),
        |st2 AS (SELECT doc_id,
        |    list_filter(list_transform(sts, s -> {
        |      'nw': CASE WHEN s.txt = '' THEN 0 ELSE len(string_split(s.txt, ' ')) END,
        |      'lw': COALESCE(s.lw, 0), 'txt': s.txt
        |    }), s -> s.nw > 0) AS ne
        |  FROM st),
        |cl AS (SELECT doc_id, ne,
        |    list_filter(ne, s -> s.nw >= 3 AND s.lw * 2 <= s.nw) AS ct
        |  FROM st2)
        |SELECT doc_id,
        |  CAST(len(ne) AS BIGINT) AS n_lines,
        |  CAST(len(ct) AS BIGINT) AS n_content,
        |  CAST(len(ne) - len(ct) AS BIGINT) AS n_boiler,
        |  CAST(COALESCE(list_sum(list_transform(ct, s -> s.nw)), 0) AS BIGINT) AS content_words,
        |  CAST(COALESCE(list_sum(list_transform(ne, s -> s.lw)), 0) AS BIGINT) AS link_words,
        |  md5(COALESCE(array_to_string(list_transform(ct, s -> s.txt), chr(10)), ''))
        |    AS content_hash
        |FROM cl
        |ORDER BY doc_id""".stripMargin,

    "q_url_canon" ->
      """WITH c AS (SELECT doc_id,
        |    (('0x' || substr(md5('0:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT & 2147483647) AS c0,
        |    (('0x' || substr(md5('1:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT & 2147483647) AS c1,
        |    (('0x' || substr(md5('2:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT & 2147483647) AS c2,
        |    (('0x' || substr(md5('3:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT & 2147483647) AS c3,
        |    (('0x' || substr(md5('4:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT & 2147483647) AS c4,
        |    (('0x' || substr(md5('5:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT & 2147483647) AS c5
        |  FROM documents),
        |u AS (SELECT doc_id,
        |    (CASE WHEN c1 % 2 = 0 THEN 'HTTP' ELSE 'https' END)
        |    || '://'
        |    || (CASE WHEN c2 % 2 = 0
        |         THEN upper(HOSTS[CAST(c0 % 12 AS INT) + 1])
        |         ELSE HOSTS[CAST(c0 % 12 AS INT) + 1] END)
        |    || ':' || CAST(HOSTPORTS[CAST(c3 % 3 AS INT) + 1] AS VARCHAR)
        |    || '/p' || CAST(doc_id % 7 AS VARCHAR)
        |    || (CASE WHEN c4 % 3 = 0 THEN '?b=2&utm_source=news&a=1'
        |             WHEN c4 % 3 = 1 THEN '?a=1&fbclid=xyz&b=2'
        |             ELSE '' END)
        |    || (CASE WHEN c5 % 2 = 0 THEN '#sec1' ELSE '' END) AS url
        |  FROM c),
        |x AS (SELECT doc_id, url,
        |    lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS s,
        |    lower(regexp_extract(url, '^[A-Za-z]+://([^/:?#]+)', 1)) AS h,
        |    regexp_extract(url, '^[A-Za-z]+://[^/:?#]+:(\d+)', 1) AS pt,
        |    regexp_extract(url, '^[A-Za-z]+://[^/?#]+(/[^?#]*)', 1) AS pa,
        |    regexp_extract(url, '\?([^#]*)', 1) AS q
        |  FROM u),
        |y AS (SELECT doc_id, url, s, h, pt, pa,
        |    list_filter(string_split(q, '&'), p -> length(p) > 0) AS allp,
        |    list_filter(string_split(q, '&'), p -> length(p) > 0
        |      AND NOT starts_with(p, 'utm_') AND NOT starts_with(p, 'fbclid=')
        |      AND NOT starts_with(p, 'gclid=')) AS keep
        |  FROM x)
        |SELECT doc_id, url,
        |  s || '://' || h
        |  || (CASE WHEN pt <> '' AND NOT ((s = 'http' AND pt = '80')
        |            OR (s = 'https' AND pt = '443'))
        |       THEN ':' || pt ELSE '' END)
        |  || pa
        |  || (CASE WHEN len(keep) > 0
        |       THEN '?' || array_to_string(list_sort(keep), '&') ELSE '' END)
        |    AS canon_url,
        |  CAST(len(allp) - len(keep) AS BIGINT) AS dropped_params
        |FROM y
        |ORDER BY doc_id""".stripMargin
        .replace("HOSTPORTS", "[80, 443, 8080]")
        .replace("HOSTS", "['www.acme.com', 'blog.widget.co.uk', 'contoso.org.uk', 'fabrikam.github.io', 'example.ac.jp', 'shop.example.jp', 'foo.bar.ck', 'www.ck', 'mail.www.ck', 'nonexistent.zz', 'com', 'deep.sub.acme.co.uk']"),

    "q_blocklist" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |g AS (SELECT doc_id, unnest(list_concat(l,
        |        CASE WHEN len(l) < 2 THEN []::VARCHAR[]
        |             ELSE list_transform(generate_series(1, len(l) - 1),
        |                    i -> l[i] || ' ' || l[i + 1]) END)) AS phrase
        |      FROM tok),
        |h AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits,
        |        CAST(COUNT(DISTINCT phrase) AS BIGINT) AS n_phrases
        |      FROM g
        |      WHERE phrase IN ('dup', 'slow scan', 'big hash', 'stream dup')
        |      GROUP BY doc_id)
        |SELECT d.doc_id,
        |  COALESCE(h.n_hits, 0) AS n_hits,
        |  COALESCE(h.n_phrases, 0) AS n_phrases,
        |  CASE WHEN h.n_hits IS NOT NULL THEN 1 ELSE 0 END AS dropped
        |FROM documents d LEFT JOIN h USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "q_corpus_curate" ->
      """WITH scored AS (
        |  SELECT doc_id, text,
        |    len(list_filter(string_split(text,' '), t -> t IN ('the','and','of','to','a')))   AS s_en,
        |    len(list_filter(string_split(text,' '), t -> t IN ('der','die','das','und','ist'))) AS s_de,
        |    len(list_filter(string_split(text,' '), t -> t IN ('el','los','y','que','en')))   AS s_es,
        |    len(list_filter(string_split(text,' '), t -> t IN ('le','les','et','des','un')))  AS s_fr,
        |    len(list_filter(string_split(text,' '), t -> t IN ('de','shi','le','wo','ni')))   AS s_zh,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |pred AS (
        |  SELECT doc_id, text, n_tokens,
        |    CASE
        |      WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
        |      WHEN s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
        |      WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
        |      WHEN s_fr >= s_zh THEN 'fr'
        |      ELSE 'zh'
        |    END AS pred_lang
        |  FROM scored
        |  WHERE n_tokens BETWEEN 20 AND 80)
        |SELECT MIN(doc_id) AS doc_id, MIN(pred_lang) AS pred_lang, COUNT(*) AS n_copies
        |FROM pred
        |GROUP BY md5(text)
        |ORDER BY doc_id""".stripMargin,

    "q_corpus_stats" ->
      """SELECT COUNT(*) AS n_docs,
        |  CAST(SUM(len(regexp_extract_all(text, '[^ ]+'))) AS BIGINT) AS total_tokens,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  COUNT(DISTINCT lang) AS n_langs
        |FROM documents""".stripMargin,

    "q_shard_balance" ->
      """WITH s AS (
        |  SELECT doc_id, CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS tok
        |  FROM documents),
        |x AS (
        |  SELECT tok,
        |         CAST((ROW_NUMBER() OVER (ORDER BY tok DESC, doc_id) - 1) % 8 AS BIGINT) AS shard
        |  FROM s)
        |SELECT shard, CAST(SUM(tok) AS BIGINT) AS shard_tokens, COUNT(*) AS n_docs
        |FROM x
        |GROUP BY shard
        |ORDER BY shard""".stripMargin,

    "q_sample_hash" ->
      """SELECT doc_id FROM documents
        |WHERE substr(md5(text), 1, 1) IN ('0','1','2','3')
        |ORDER BY doc_id""".stripMargin,

    "q_stratified_sample" ->
      """WITH c AS (SELECT lang, COUNT(*) AS n_lang FROM documents GROUP BY lang),
        |t AS (SELECT lang, n_lang,
        |             printf('%04x', CAST(floor(least(1.0, 60.0 / n_lang) * 65536) AS INT)) AS thresh
        |      FROM c)
        |SELECT d.doc_id, d.lang
        |FROM documents d JOIN t USING (lang)
        |WHERE t.n_lang <= 60 OR substr(md5(d.text), 1, 4) < t.thresh
        |ORDER BY d.doc_id""".stripMargin,

    // priority sampling: identical multiply-then-divide op order as the
    // Spark kernel, so the doubles are bit-equal and ranks can't drift
    "q_weighted_sample" ->
      """WITH pri AS (
        |  SELECT source, doc_id, n_chars,
        |         CAST(n_chars AS DOUBLE) * 2147483648.0
        |           / CAST((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |                   & 2147483647) + 1 AS DOUBLE) AS priority
        |  FROM documents),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY source
        |                  ORDER BY priority DESC, doc_id) AS rk FROM pri)
        |SELECT source, doc_id, n_chars, priority
        |FROM r WHERE rk <= 5
        |ORDER BY source, priority DESC, doc_id""".stripMargin,

    // interval overlap join: the oracle replays the DEFINITION (all
    // same-part pairs + the overlap predicate), gating the bucketed
    // plan's week-explode + dedupe-at-overlap-start against the spec
    // span-classed gate: the oracle is the all-pairs DEFINITION over
    // the heavy-tailed intervals — proves the short/long class split
    // partitions the pair space exactly
    "q_interval_join_skew" ->
      """WITH iv AS (SELECT l_partkey AS pk,
        |        l_orderkey * 8 + l_linenumber AS id,
        |        (l_shipdate::DATE - DATE '1970-01-01') AS s,
        |        CASE WHEN (l_orderkey * 8 + l_linenumber) % 97 = 0
        |             THEN 180 + (l_orderkey * 8 + l_linenumber) % 200
        |             ELSE (l_orderkey * 8 + l_linenumber) % 14 + 1
        |        END AS tr
        |      FROM lineitem),
        |iv2 AS (SELECT pk, id, s, s + tr AS r FROM iv),
        |pairs AS (SELECT a.pk,
        |        least(a.r, b.r) - greatest(a.s, b.s) + 1 AS od
        |      FROM iv2 a JOIN iv2 b ON a.pk = b.pk AND a.id < b.id
        |      WHERE a.s <= b.r AND b.s <= a.r)
        |SELECT CAST(pk AS BIGINT) AS p_partkey,
        |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |  CAST(SUM(od) AS BIGINT) AS overlap_days,
        |  CAST(MAX(od) AS BIGINT) AS max_overlap
        |FROM pairs GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_interval_join" ->
      """WITH li AS (SELECT l_partkey AS pk,
        |        l_orderkey * 8 + l_linenumber AS id,
        |        (l_shipdate::DATE - DATE '1970-01-01') AS s,
        |        (l_shipdate::DATE - DATE '1970-01-01')
        |          + (l_orderkey + l_linenumber) % 21 + 7 AS r
        |      FROM lineitem),
        |pairs AS (SELECT a.pk,
        |        least(a.r, b.r) - greatest(a.s, b.s) + 1 AS od
        |      FROM li a JOIN li b ON a.pk = b.pk AND a.id < b.id
        |      WHERE a.s <= b.r AND b.s <= a.r)
        |SELECT CAST(pk AS BIGINT) AS p_partkey,
        |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |  CAST(SUM(od) AS BIGINT) AS overlap_days,
        |  CAST(MAX(od) AS BIGINT) AS max_overlap
        |FROM pairs GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_range_join" ->
      """WITH p AS (SELECT event_id AS purchase_id, user_id, ts AS p_ts
        |           FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts AS c_ts, value
        |      FROM events WHERE event_type = 'click'),
        |m AS (SELECT p.purchase_id, COUNT(c.c_ts) AS n_clicks,
        |             CAST(SUM(CAST(c.value AS DECIMAL(9,2))) AS DOUBLE) AS click_value
        |      FROM p LEFT JOIN c ON c.user_id = p.user_id
        |        AND c.c_ts > p.p_ts - INTERVAL 1 HOUR AND c.c_ts <= p.p_ts
        |      GROUP BY 1)
        |SELECT purchase_id, n_clicks, COALESCE(click_value, 0.0) AS click_value
        |FROM m
        |ORDER BY purchase_id""".stripMargin,

    // the SA rank table's repeated groups must equal plain substring
    // grouping — DuckDB takes the direct route, Spark the doubling one
    "q_sa_dedup" ->
      """WITH RECURSIVE d AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0),
        |pos AS (SELECT doc_id, text,
        |    unnest(generate_series(1, length(text))) AS off FROM d),
        |s AS (SELECT substr(text, CAST(off AS INT), 32) AS prefix, doc_id FROM pos),
        |g AS (SELECT prefix FROM s GROUP BY prefix
        |      HAVING COUNT(*) BETWEEN 2 AND 20),
        |gd AS (SELECT DISTINCT s.prefix, s.doc_id FROM s JOIN g USING (prefix)),
        |gm AS (SELECT prefix, MIN(doc_id) AS a FROM gd GROUP BY prefix),
        |e AS (SELECT DISTINCT gm.a, gd.doc_id AS b
        |      FROM gd JOIN gm ON gd.prefix = gm.prefix
        |      WHERE gd.doc_id <> gm.a),
        |sym AS (SELECT a AS src, b AS dst FROM e
        |        UNION SELECT b AS src, a AS dst FROM e),
        |reach(node, lbl) AS (
        |  SELECT DISTINCT src AS node, src AS lbl FROM sym
        |  UNION
        |  SELECT s2.src, r.lbl FROM sym s2 JOIN reach r ON s2.dst = r.node),
        |cc AS (SELECT node, MIN(lbl) AS lbl FROM reach GROUP BY node)
        |SELECT d.doc_id,
        |  COALESCE(cc.lbl, d.doc_id) AS cluster_id,
        |  CASE WHEN COALESCE(cc.lbl, d.doc_id) = d.doc_id THEN 1 ELSE 0 END
        |    AS survivor
        |FROM d LEFT JOIN cc ON cc.node = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    "q_repeated_spans" ->
      """WITH pos AS (SELECT doc_id, text,
        |    unnest(generate_series(1, length(text))) AS off
        |  FROM documents WHERE doc_id % 5 = 0),
        |s AS (SELECT substr(text, CAST(off AS INT), 16) AS prefix, doc_id
        |      FROM pos)
        |SELECT prefix, CAST(COUNT(*) AS BIGINT) AS n_occ,
        |       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        |FROM s GROUP BY prefix HAVING COUNT(*) >= 2
        |ORDER BY prefix""".stripMargin,

    "q_label_prop" ->
      """WITH e AS (
        |  SELECT a.l_partkey AS a, b.l_partkey AS b
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND b.l_partkey > a.l_partkey
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |sym AS (SELECT a AS src, b AS dst FROM e
        |        UNION ALL SELECT b AS src, a AS dst FROM e),
        |l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM sym),
        |l1 AS (SELECT node, lbl FROM (
        |    SELECT s.src AS node, l.lbl, COUNT(*) AS n,
        |           ROW_NUMBER() OVER (PARTITION BY s.src
        |                              ORDER BY COUNT(*) DESC, l.lbl) AS rn
        |    FROM sym s JOIN l0 l ON s.dst = l.node
        |    GROUP BY s.src, l.lbl)
        |  WHERE rn = 1),
        |l2 AS (SELECT node, lbl FROM (
        |    SELECT s.src AS node, l.lbl, COUNT(*) AS n,
        |           ROW_NUMBER() OVER (PARTITION BY s.src
        |                              ORDER BY COUNT(*) DESC, l.lbl) AS rn
        |    FROM sym s JOIN l1 l ON s.dst = l.node
        |    GROUP BY s.src, l.lbl)
        |  WHERE rn = 1),
        |l3 AS (SELECT node, lbl FROM (
        |    SELECT s.src AS node, l.lbl, COUNT(*) AS n,
        |           ROW_NUMBER() OVER (PARTITION BY s.src
        |                              ORDER BY COUNT(*) DESC, l.lbl) AS rn
        |    FROM sym s JOIN l2 l ON s.dst = l.node
        |    GROUP BY s.src, l.lbl)
        |  WHERE rn = 1)
        |SELECT node AS part_id, lbl AS community,
        |       COUNT(*) OVER (PARTITION BY lbl) AS community_size
        |FROM l3
        |ORDER BY part_id""".stripMargin,

    "q_components" ->
      """WITH RECURSIVE e AS (
        |  SELECT a.l_partkey AS a, b.l_partkey AS b
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND b.l_partkey > a.l_partkey
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |sym AS (SELECT a AS src, b AS dst FROM e
        |        UNION ALL SELECT b AS src, a AS dst FROM e),
        |reach(node, lbl) AS (
        |  SELECT DISTINCT src AS node, src AS lbl FROM sym
        |  UNION
        |  SELECT s.src, r.lbl FROM sym s JOIN reach r ON s.dst = r.node),
        |cc AS (SELECT node, MIN(lbl) AS cluster_id FROM reach GROUP BY node)
        |SELECT node AS part_id, cluster_id,
        |       COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
        |FROM cc
        |ORDER BY part_id""".stripMargin,

    "q_pii_redact" ->
      """WITH f AS (
        |  SELECT doc_id,
        |         text || ' contact user' || CAST(doc_id AS VARCHAR)
        |              || '@example.com or 555-'
        |              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '.' AS footer
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(footer, '[A-Za-z0-9._]+@[A-Za-z0-9.-]+')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(footer, '[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
        |  md5(regexp_replace(
        |        regexp_replace(footer, '[A-Za-z0-9._]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
        |        '[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS redacted_hash
        |FROM f
        |ORDER BY doc_id""".stripMargin,

    "q_tfidf" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
        |n AS (SELECT COUNT(*) AS n FROM documents),
        |x AS (SELECT tf.doc_id, tf.term, CAST(tf.tf * n.n AS DOUBLE) / df.df AS tfidf
        |      FROM tf JOIN df USING (term) CROSS JOIN n
        |      WHERE tf.doc_id % 25 = 0),
        |r AS (SELECT doc_id, term, tfidf,
        |             CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
        |                                     ORDER BY tfidf DESC, term) AS BIGINT) AS rnk
        |      FROM x)
        |SELECT doc_id, rnk, term, tfidf FROM r WHERE rnk <= 3
        |ORDER BY doc_id, rnk""".stripMargin,

    "q_word_count" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
        |c AS (SELECT term, COUNT(*) AS n FROM tok
        |      WHERE length(term) >= 4 GROUP BY term)
        |SELECT term, n FROM c
        |ORDER BY n DESC, term
        |LIMIT 100""".stripMargin,

    "q_array_funcs" ->
      """SELECT p_partkey,
        |  CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_words,
        |  CAST(len(list_distinct(string_split(p_name, ' '))) AS BIGINT) AS n_distinct,
        |  array_to_string(list_slice(list_sort(string_split(p_name, ' ')), 1, 3), '-') AS first3_sorted,
        |  list_contains(string_split(p_name, ' '), 'green') AS has_green,
        |  list_reverse_sort(string_split(p_name, ' '))[1] AS max_word
        |FROM part
        |ORDER BY p_partkey""".stripMargin,

    "q_window_dedup" ->
      """SELECT lang, source, doc_id, n_chars FROM (
        |  SELECT lang, source, doc_id, n_chars,
        |         ROW_NUMBER() OVER (PARTITION BY lang, source ORDER BY doc_id) AS rn
        |  FROM documents) x
        |WHERE rn = 1
        |ORDER BY lang, source""".stripMargin,

    "q6_forecast" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2))
        |               * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
        |       COUNT(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q4_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q12_shipmode" ->
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus""".stripMargin,

    "q14_promo" ->
      """SELECT CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
        |         THEN CAST(l_extendedprice AS DECIMAL(9,2))
        |              * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
        |         ELSE CAST(0 AS DECIMAL(9,2)) END) AS DOUBLE) * 100.0
        |       / CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2))
        |              * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
        |         AS promo_revenue,
        |       COUNT(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1996-07-01 00:00:00'""".stripMargin,

    "q_rank_funcs" ->
      """SELECT o_orderpriority, o_orderkey,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd,
        |  nth_value(o_orderkey, 3) OVER (PARTITION BY o_orderpriority
        |     ORDER BY o_totalprice DESC, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS third_key
        |FROM orders
        |WHERE o_custkey < 50
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,

    "q_unpivot" ->
      """WITH wide AS (
        |  SELECT user_id,
        |    COUNT(*) FILTER (WHERE event_type = 'click')    AS n_click,
        |    COUNT(*) FILTER (WHERE event_type = 'error')    AS n_error,
        |    COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
        |    COUNT(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
        |    COUNT(*) FILTER (WHERE event_type = 'view')     AS n_view
        |  FROM events GROUP BY user_id)
        |SELECT user_id, metric, v FROM (
        |  SELECT user_id, 'n_click' AS metric, n_click AS v FROM wide
        |  UNION ALL SELECT user_id, 'n_error', n_error FROM wide
        |  UNION ALL SELECT user_id, 'n_purchase', n_purchase FROM wide
        |  UNION ALL SELECT user_id, 'n_signup', n_signup FROM wide
        |  UNION ALL SELECT user_id, 'n_view', n_view FROM wide) x
        |WHERE user_id < 200
        |ORDER BY user_id, metric""".stripMargin,

    "q_hop_window" ->
      """WITH x AS (
        |  SELECT event_type, ts, epoch_us(ts) // 1800000000 AS b
        |  FROM events),
        |h AS (
        |  SELECT event_type,
        |         unnest(ARRAY[to_timestamp((b - 1) * 1800), to_timestamp(b * 1800)]) AS w
        |  FROM x)
        |SELECT CAST(w AS TIMESTAMP) AS win_start, event_type, COUNT(*) AS n
        |FROM h
        |GROUP BY 1, 2
        |ORDER BY win_start, event_type""".stripMargin,

    "q_tar_roundtrip" ->
      """SELECT doc_id,
        |  CAST(doc_id // 64 AS BIGINT) AS shard_id,
        |  CAST(strlen(text) AS BIGINT) AS n_bytes,
        |  md5(text) AS fingerprint
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    // dHash replayed pixel-for-pixel from the md5 gray formula (PNG is
    // lossless, so the engine's DECODED pixels equal the formula), then
    // the band join, Hamming verify, and recursive-CTE closure
    "q_image_phash" ->
      """WITH RECURSIVE d AS (SELECT doc_id, doc_id % 97 AS fam FROM documents),
        |px AS (SELECT doc_id, fam, xs.x AS x, ys.y AS y
        |       FROM d, generate_series(0, 7) xs(x), generate_series(0, 7) ys(y)),
        |g AS (SELECT doc_id, x, y,
        |        CASE WHEN doc_id % 5 = 0 AND x = doc_id % 8
        |                  AND y = (doc_id // 8) % 8
        |             THEN (('0x' || substr(md5(fam || '_' || x || '_' || y), 1, 2))::INT + 128) % 256
        |             ELSE ('0x' || substr(md5(fam || '_' || x || '_' || y), 1, 2))::INT
        |        END AS gray
        |      FROM px),
        |bits AS (SELECT a.doc_id, a.y, a.x,
        |           CASE WHEN b.gray > a.gray THEN 1 ELSE 0 END AS bit
        |         FROM g a JOIN g b ON b.doc_id = a.doc_id AND b.y = a.y
        |           AND b.x = a.x + 1
        |         WHERE a.x < 7),
        |h AS (SELECT doc_id,
        |        CAST(SUM(bit * (1::BIGINT << (y * 7 + x))) AS BIGINT) AS dhash
        |      FROM bits GROUP BY 1),
        |bands AS (SELECT doc_id, dhash, bs.b AS b,
        |            (dhash >> (bs.b * 14)) & 16383 AS v
        |          FROM h, generate_series(0, 3) bs(b)),
        |cand AS (SELECT DISTINCT a.doc_id AS pa, b.doc_id AS pb,
        |            a.dhash AS ha, b.dhash AS hb
        |         FROM bands a JOIN bands b
        |           ON a.b = b.b AND a.v = b.v AND a.doc_id < b.doc_id),
        |pairs AS (SELECT pa AS a, pb AS b FROM cand
        |          WHERE bit_count(xor(ha, hb)) <= 2),
        |sym AS (SELECT a AS src, b AS dst FROM pairs
        |        UNION ALL SELECT b AS src, a AS dst FROM pairs),
        |reach(node, lbl) AS (
        |  SELECT DISTINCT src AS node, src AS lbl FROM sym
        |  UNION
        |  SELECT s.src, r.lbl FROM sym s JOIN reach r ON s.dst = r.node),
        |cc AS (SELECT node, MIN(lbl) AS cluster_id FROM reach GROUP BY node),
        |cs AS (SELECT node, cluster_id,
        |         COUNT(*) OVER (PARTITION BY cluster_id) AS csz FROM cc)
        |SELECT h.doc_id, h.dhash,
        |  CAST(COALESCE(cs.cluster_id, h.doc_id) AS BIGINT) AS cluster_id,
        |  CAST(COALESCE(cs.csz, 1) AS BIGINT) AS cluster_size
        |FROM h LEFT JOIN cs ON h.doc_id = cs.node
        |ORDER BY h.doc_id""".stripMargin,

    // gzip -> disk -> binaryFile -> inflate -> regroup identity: the
    // shard id survives via the FILE NAME, all three modalities
    // survive the container, the text entry is byte-exact
    "q_webdataset_gz" ->
      """SELECT doc_id,
        |  CAST(doc_id // 64 AS BIGINT) AS shard_id,
        |  CAST(3 AS BIGINT) AS n_modalities,
        |  CAST(strlen(text) AS BIGINT) AS n_chars,
        |  md5(text) AS fingerprint
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "q_snapshot_cdc" ->
      """WITH o AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |old AS (SELECT o_orderkey AS k, o_orderstatus AS st_o, o_totalprice AS pr_o
        |        FROM o WHERE o_orderkey % 10 != 0),
        |neu AS (SELECT o_orderkey AS k, o_orderstatus AS st_n,
        |               CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0
        |                    ELSE o_totalprice END AS pr_n
        |        FROM o WHERE o_orderkey % 7 != 0),
        |d AS (
        |  SELECT COALESCE(old.k, neu.k) AS k,
        |    CASE WHEN st_o IS NULL THEN 'I'
        |         WHEN st_n IS NULL THEN 'D'
        |         WHEN pr_o IS DISTINCT FROM pr_n OR st_o IS DISTINCT FROM st_n THEN 'U'
        |         ELSE 'S' END AS change
        |  FROM old FULL OUTER JOIN neu ON old.k = neu.k)
        |SELECT change, COUNT(*) AS n, MIN(k) AS first_key, MAX(k) AS last_key
        |FROM d
        |WHERE change != 'S'
        |GROUP BY change
        |ORDER BY change""".stripMargin,

    // version-attributed CDC gate: each step diff replayed with its
    // literal version — v2 is the keyed v1->v2 classification, v3 the
    // delete slice (survivor rewrites suppressed by keyed hashing)
    "q_cdc_versions" ->
      """WITH o AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |old1 AS (SELECT o_orderkey AS k, o_orderstatus AS st_o, o_totalprice AS pr_o
        |         FROM o WHERE o_orderkey % 10 != 0),
        |new2 AS (SELECT o_orderkey AS k, o_orderstatus AS st_n,
        |                CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0
        |                     ELSE o_totalprice END AS pr_n
        |         FROM o WHERE o_orderkey % 7 != 0),
        |d2 AS (
        |  SELECT CAST(2 AS BIGINT) AS commit_v, COALESCE(old1.k, new2.k) AS k,
        |    CASE WHEN st_o IS NULL THEN 'I'
        |         WHEN st_n IS NULL THEN 'D'
        |         WHEN pr_o IS DISTINCT FROM pr_n OR st_o IS DISTINCT FROM st_n THEN 'U'
        |         ELSE 'S' END AS change
        |  FROM old1 FULL OUTER JOIN new2 ON old1.k = new2.k),
        |d3 AS (
        |  SELECT CAST(3 AS BIGINT) AS commit_v, k, 'D' AS change
        |  FROM new2 WHERE k % 13 = 0),
        |d AS (SELECT * FROM d2 WHERE change != 'S' UNION ALL SELECT * FROM d3)
        |SELECT commit_v, change, COUNT(*) AS n,
        |  MIN(k) AS first_key, MAX(k) AS last_key
        |FROM d GROUP BY commit_v, change
        |ORDER BY commit_v, change""".stripMargin,

    // deletion-vector gate: live side = the surviving slice read
    // through the post-compaction version, delete counts from the
    // DV commit's keyed CDC (old payload)
    "q_snapshot_dv" ->
      """WITH live AS (SELECT o_orderkey, o_orderstatus FROM orders
        |             WHERE o_orderkey % 11 != 0),
        |dels AS (SELECT o_orderkey, o_orderstatus FROM orders
        |         WHERE o_orderkey % 11 = 0),
        |l AS (SELECT o_orderstatus, COUNT(*) AS n_live,
        |        MIN(o_orderkey) AS first_live, MAX(o_orderkey) AS last_live
        |      FROM live GROUP BY o_orderstatus),
        |d AS (SELECT o_orderstatus, COUNT(*) AS n_deleted
        |      FROM dels GROUP BY o_orderstatus)
        |SELECT COALESCE(l.o_orderstatus, d.o_orderstatus) AS o_orderstatus,
        |  CAST(COALESCE(n_live, 0) AS BIGINT) AS n_live,
        |  first_live, last_live,
        |  CAST(COALESCE(n_deleted, 0) AS BIGINT) AS n_deleted
        |FROM l FULL OUTER JOIN d ON l.o_orderstatus = d.o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    // MERGE INTO gate: every clause replayed as a FULL OUTER JOIN +
    // CASE ladder (first-match-wins order preserved); 'drop' is the
    // filtered-out insert, 'del' the conditional delete
    "q_merge_into" ->
      """WITH t AS (SELECT o_orderkey, o_orderstatus, o_totalprice
        |           FROM orders WHERE o_orderkey % 10 < 5),
        |s AS (SELECT o_orderkey, 'N' AS o_orderstatus,
        |             o_totalprice * 2 AS o_totalprice
        |      FROM orders WHERE o_orderkey % 10 BETWEEN 3 AND 7),
        |m AS (SELECT
        |    COALESCE(t.o_orderkey, s.o_orderkey) AS k,
        |    CASE WHEN t.o_orderkey IS NULL THEN
        |           CASE WHEN s.o_orderkey % 2 = 0 THEN 'ins' ELSE 'drop' END
        |         WHEN s.o_orderkey IS NULL THEN 'keep'
        |         WHEN t.o_totalprice < 150000 THEN 'upd'
        |         WHEN t.o_orderstatus = 'F' THEN 'del'
        |         ELSE 'keep' END AS act,
        |    t.o_orderstatus AS tst, t.o_totalprice AS tp,
        |    s.o_orderstatus AS sst, s.o_totalprice AS sp
        |  FROM t FULL OUTER JOIN s ON t.o_orderkey = s.o_orderkey),
        |fin AS (SELECT k,
        |    CASE act WHEN 'ins' THEN sst WHEN 'upd' THEN 'U' ELSE tst END
        |      AS o_orderstatus,
        |    CASE act WHEN 'ins' THEN sp WHEN 'upd' THEN sp ELSE tp END
        |      AS price
        |  FROM m WHERE act NOT IN ('del', 'drop'))
        |SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
        |  MIN(k) AS first_key, MAX(k) AS last_key,
        |  CAST(SUM(CAST(FLOOR(price * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS sum_cents
        |FROM fin GROUP BY 1 ORDER BY 1""".stripMargin,

    // constraint suite replayed verbatim: NOT IN's three-valued logic
    // matches Spark's negated isin (NULL rows count as 0 in both)
    "q_dq_audit" ->
      """WITH rep AS (
        |  SELECT 'completeness:o_orderstatus' AS check_name,
        |    COUNT(*) AS n_checked,
        |    SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS n_violations
        |  FROM orders
        |  UNION ALL
        |  SELECT 'accepted_values:o_orderstatus', COUNT(*),
        |    SUM(CASE WHEN o_orderstatus NOT IN ('F','O','P') THEN 1 ELSE 0 END)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'positive:o_totalprice', COUNT(*),
        |    SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'uniqueness:o_orderkey', SUM(c),
        |    SUM(CASE WHEN c > 1 THEN c ELSE 0 END)
        |  FROM (SELECT COUNT(*) AS c FROM orders GROUP BY o_orderkey)
        |  UNION ALL
        |  SELECT 'ref_integrity:orders.o_custkey',
        |    (SELECT COUNT(*) FROM orders),
        |    (SELECT COUNT(*) FROM orders o LEFT JOIN customer c
        |     ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL)
        |  UNION ALL
        |  SELECT 'consistency:l_shipdate>=o_orderdate', COUNT(*),
        |    SUM(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0 END)
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
        |SELECT check_name, CAST(n_checked AS BIGINT) AS n_checked,
        |  CAST(n_violations AS BIGINT) AS n_violations,
        |  CASE WHEN n_violations = 0 THEN 'PASS' ELSE 'FAIL' END AS verdict
        |FROM rep ORDER BY check_name""".stripMargin,

    // IVM gate: the oracle is the FULL recompute of the final state
    // (v2 slice minus the deleted keys) — the Spark side never touches
    // the base after v1, only CDC deltas
    "q_ivm" ->
      """WITH f AS (SELECT o_orderstatus AS st,
        |    CAST(FLOOR((CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0
        |                     ELSE o_totalprice END) * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders WHERE o_orderkey % 7 <> 0 AND o_orderkey % 13 <> 0)
        |SELECT st AS o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(cents) AS BIGINT) AS sum_cents
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,

    // stats-pruned row deletes + keyed CDC delete delta: live side is
    // the surviving slice, delete counts carry the OLD payload
    "q_snapshot_delete" ->
      """WITH live AS (SELECT o_orderkey, o_orderstatus FROM orders
        |             WHERE o_orderkey % 13 != 0),
        |dels AS (SELECT o_orderkey, o_orderstatus FROM orders
        |         WHERE o_orderkey % 13 = 0),
        |l AS (SELECT o_orderstatus, COUNT(*) AS n_live,
        |        MIN(o_orderkey) AS first_live, MAX(o_orderkey) AS last_live
        |      FROM live GROUP BY o_orderstatus),
        |d AS (SELECT o_orderstatus, COUNT(*) AS n_deleted
        |      FROM dels GROUP BY o_orderstatus)
        |SELECT COALESCE(l.o_orderstatus, d.o_orderstatus) AS o_orderstatus,
        |  COALESCE(n_live, 0) AS n_live, first_live, last_live,
        |  COALESCE(n_deleted, 0) AS n_deleted
        |FROM l FULL OUTER JOIN d ON l.o_orderstatus = d.o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    "q_snapshot_prune" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  MIN(o_orderkey) AS first_key, MAX(o_orderkey) AS last_key,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |WHERE o_orderkey BETWEEN 100 AND 4000
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    // predicate DELETE gate (r18): the statement's predicate replayed
    // as a plain WHERE NOT; delete counts carry the OLD payload
    "q_delete_where" ->
      """WITH live AS (SELECT o_orderkey, o_orderstatus FROM orders
        |  WHERE NOT (o_totalprice > 150000 AND o_orderstatus = 'O')),
        |dels AS (SELECT o_orderkey, o_orderstatus FROM orders
        |  WHERE o_totalprice > 150000 AND o_orderstatus = 'O'),
        |l AS (SELECT o_orderstatus, COUNT(*) AS n_live,
        |        MIN(o_orderkey) AS first_live, MAX(o_orderkey) AS last_live
        |      FROM live GROUP BY o_orderstatus),
        |d AS (SELECT o_orderstatus, COUNT(*) AS n_deleted
        |      FROM dels GROUP BY o_orderstatus)
        |SELECT COALESCE(l.o_orderstatus, d.o_orderstatus) AS o_orderstatus,
        |  CAST(COALESCE(n_live, 0) AS BIGINT) AS n_live,
        |  first_live, last_live,
        |  CAST(COALESCE(n_deleted, 0) AS BIGINT) AS n_deleted
        |FROM l FULL OUTER JOIN d ON l.o_orderstatus = d.o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    // predicate UPDATE gate (r18): the assignment replayed as a CASE;
    // the CDC update window cross-joined onto every group row
    "q_update_where" ->
      """WITH f AS (SELECT o_orderkey,
        |    CASE WHEN o_orderstatus = 'F' AND o_orderkey % 7 = 0
        |         THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
        |    CASE WHEN o_orderstatus = 'F' AND o_orderkey % 7 = 0
        |         THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice
        |  FROM orders),
        |u AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_updated,
        |        MIN(o_orderkey) AS first_upd, MAX(o_orderkey) AS last_upd
        |      FROM orders WHERE o_orderstatus = 'F' AND o_orderkey % 7 = 0)
        |SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS sum_cents,
        |  n_updated, first_upd, last_upd
        |FROM f CROSS JOIN u
        |GROUP BY o_orderstatus, n_updated, first_upd, last_upd
        |ORDER BY o_orderstatus""".stripMargin,

    // RESTORE gate (r18): the rollback's keyed CDC — resurrected
    // DV-masked rows as inserts, rolled-back appended rows as
    // deletes — plus the restored live totals
    "q_restore" ->
      """WITH i AS (
        |  SELECT 'I' AS change, COUNT(*) AS n,
        |    MIN(o_orderkey) AS first_key, MAX(o_orderkey) AS last_key
        |  FROM orders WHERE o_orderkey % 10 != 0 AND o_orderkey % 11 = 0),
        |d AS (
        |  SELECT 'D' AS change, COUNT(*) AS n,
        |    MIN(o_orderkey) AS first_key, MAX(o_orderkey) AS last_key
        |  FROM orders WHERE o_orderkey % 10 = 0),
        |l AS (
        |  SELECT 'LIVE' AS change, COUNT(*) AS n,
        |    MIN(o_orderkey) AS first_key, MAX(o_orderkey) AS last_key
        |  FROM orders WHERE o_orderkey % 10 != 0)
        |SELECT * FROM i UNION ALL SELECT * FROM d UNION ALL SELECT * FROM l
        |ORDER BY change""".stripMargin,

    // partitioned-table equality gate (r18): partitionBy commit +
    // readWhereEq must match the plain WHERE
    "q_snapshot_partition" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  MIN(o_orderkey) AS first_key, MAX(o_orderkey) AS last_key,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |WHERE o_orderstatus = 'F'
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    // all-column stats gate (r18): the filter column is NOT the
    // declared stats key — pruning + residual filter must still match
    // the plain WHERE
    "q_snapshot_prune_multi" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  MIN(o_orderkey) AS first_key, MAX(o_orderkey) AS last_key,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |WHERE o_totalprice >= 1000 AND o_totalprice <= 50000
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    "q_snapshot_diff" ->
      """WITH o AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |old AS (SELECT o_orderkey AS k, o_orderstatus AS st_o, o_totalprice AS pr_o
        |        FROM o WHERE o_orderkey % 10 != 0),
        |neu AS (SELECT o_orderkey AS k, o_orderstatus AS st_n,
        |               CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0
        |                    ELSE o_totalprice END AS pr_n
        |        FROM o WHERE o_orderkey % 7 != 0),
        |d AS (
        |  SELECT COALESCE(old.k, neu.k) AS k,
        |    CASE WHEN st_o IS NULL THEN 'I'
        |         WHEN st_n IS NULL THEN 'D'
        |         WHEN pr_o IS DISTINCT FROM pr_n OR st_o IS DISTINCT FROM st_n THEN 'U'
        |         ELSE 'S' END AS change
        |  FROM old FULL OUTER JOIN neu ON old.k = neu.k)
        |SELECT change, COUNT(*) AS n, MIN(k) AS first_key, MAX(k) AS last_key
        |FROM d
        |GROUP BY change
        |ORDER BY change""".stripMargin,

    "q_funnel" ->
      """WITH v AS (
        |  SELECT user_id, MIN(ts) AS v_ts FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, MIN(e.ts) AS c_ts
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.v_ts
        |  GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, MIN(e.ts) AS p_ts
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
        |  GROUP BY e.user_id)
        |SELECT (SELECT COUNT(*) FROM v) AS n_view,
        |       (SELECT COUNT(*) FROM c) AS n_click_after_view,
        |       (SELECT COUNT(*) FROM p) AS n_purchase_after_click""".stripMargin,

    "q_cohort" ->
      """WITH f AS (
        |  SELECT user_id,
        |         CAST(floor(date_diff('day', DATE '1970-01-01', CAST(MIN(ts) AS DATE)) / 7) AS BIGINT) AS cohort_w
        |  FROM events GROUP BY user_id),
        |a AS (
        |  SELECT DISTINCT user_id,
        |         CAST(floor(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) / 7) AS BIGINT) AS active_w
        |  FROM events)
        |SELECT f.cohort_w, a.active_w - f.cohort_w AS weeks_since,
        |       COUNT(DISTINCT f.user_id) AS n_users
        |FROM f JOIN a ON f.user_id = a.user_id
        |GROUP BY 1, 2
        |ORDER BY cohort_w, weeks_since""".stripMargin,

    "q_transitions" ->
      """WITH x AS (
        |  SELECT event_type AS next_type,
        |         LAG(event_type) OVER (PARTITION BY user_id
        |                               ORDER BY ts, event_id) AS prev_type
        |  FROM events)
        |SELECT prev_type, next_type, COUNT(*) AS n
        |FROM x WHERE prev_type IS NOT NULL
        |GROUP BY prev_type, next_type
        |ORDER BY prev_type, next_type""".stripMargin,

    // gaps-and-islands: day − row_number is constant exactly within a
    // consecutive-day run; epoch-day integers both engines share
    "q_streaks" ->
      """WITH days AS (SELECT DISTINCT user_id,
        |        (ts::DATE - DATE '1970-01-01') AS day FROM events),
        |runs AS (SELECT user_id, day,
        |        day - ROW_NUMBER() OVER (PARTITION BY user_id
        |          ORDER BY day) AS grp
        |      FROM days),
        |isl AS (SELECT user_id, grp, COUNT(*) AS len
        |        FROM runs GROUP BY 1, 2)
        |SELECT user_id,
        |  CAST(MAX(len) AS BIGINT) AS longest_streak,
        |  CAST(COUNT(*) AS BIGINT) AS n_islands,
        |  CAST(SUM(len) AS BIGINT) AS active_days
        |FROM isl GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_gap_fill" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |         COUNT(*) AS n_events,
        |         CAST(SUM(CAST(value AS DECIMAL(9,2))) AS DOUBLE) AS day_value
        |  FROM events WHERE user_id < 20
        |  GROUP BY 1, 2),
        |spine AS (
        |  SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
        |        FROM daily GROUP BY user_id))
        |SELECT s.user_id, s.day,
        |       COALESCE(d.n_events, 0) AS n_events,
        |       last_value(d.day_value IGNORE NULLS)
        |         OVER (PARTITION BY s.user_id ORDER BY s.day
        |               ROWS UNBOUNDED PRECEDING) AS filled_value
        |FROM spine s LEFT JOIN daily d
        |  ON s.user_id = d.user_id AND s.day = d.day
        |ORDER BY s.user_id, s.day""".stripMargin,

    "q_zscore" ->
      """WITH m AS (
        |  SELECT event_type,
        |         CAST(SUM(CAST(value AS DECIMAL(9,2))) AS DOUBLE) AS s,
        |         CAST(SUM(CAST(value AS DECIMAL(9,2)) * CAST(value AS DECIMAL(9,2))) AS DOUBLE) AS q,
        |         CAST(COUNT(*) AS DOUBLE) AS n
        |  FROM events GROUP BY event_type)
        |SELECT e.event_id, e.event_type,
        |       (e.value - m.s / m.n) / sqrt(m.q / m.n - (m.s / m.n) * (m.s / m.n)) AS z
        |FROM events e JOIN m ON e.event_type = m.event_type
        |ORDER BY e.event_id""".stripMargin,

    "q_inverted_index" ->
      """WITH tok AS (
        |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |bounds AS (
        |  SELECT GREATEST(2, CAST(floor(COUNT(*) / 100.0) AS BIGINT)) AS df_lo,
        |         CAST(floor(COUNT(*) * 4 / 5.0) AS BIGINT) AS df_hi
        |  FROM documents),
        |band AS (
        |  SELECT term, COUNT(*) AS df FROM tok
        |  GROUP BY term
        |  HAVING COUNT(*) BETWEEN (SELECT df_lo FROM bounds)
        |                      AND (SELECT df_hi FROM bounds))
        |SELECT t.term, b.df,
        |       string_agg(CAST(t.doc_id AS VARCHAR), ',' ORDER BY t.doc_id) AS postings
        |FROM tok t JOIN band b ON t.term = b.term
        |GROUP BY t.term, b.df
        |ORDER BY t.term""".stripMargin,

    // —— training-pipeline corpus ops (round 3) ——
    "q_bigram_lm" ->
      """WITH tok AS (SELECT string_split(text, ' ') AS l FROM documents),
        |pos AS (SELECT l, unnest(generate_series(1, len(l) - 1)) AS i FROM tok)
        |SELECT l[i] || ' ' || l[i+1] AS bigram, COUNT(*) AS n
        |FROM pos GROUP BY 1
        |ORDER BY n DESC, bigram
        |LIMIT 30""".stripMargin,

    "q_dup_spans" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |pos AS (SELECT doc_id, l, unnest(generate_series(1, len(l) - 4)) AS i FROM tok),
        |sp AS (SELECT doc_id, array_to_string(l[i:i+4], ' ') AS g FROM pos),
        |c AS (SELECT g, COUNT(*) AS cg FROM sp GROUP BY g)
        |SELECT sp.doc_id, COUNT(*) AS n_spans,
        |       CAST(SUM(CASE WHEN cg >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
        |       CAST(SUM(CASE WHEN cg >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS dup_frac
        |FROM sp JOIN c USING (g)
        |GROUP BY sp.doc_id
        |ORDER BY sp.doc_id""".stripMargin,

    "q_lm_novelty" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |pos AS (SELECT doc_id, l, unnest(generate_series(1, len(l) - 1)) AS i FROM tok),
        |bg AS (SELECT doc_id, l[i] || ' ' || l[i+1] AS bigram FROM pos),
        |c AS (SELECT bigram, COUNT(*) AS cb FROM bg GROUP BY bigram)
        |SELECT bg.doc_id, COUNT(*) AS n_bg,
        |       CAST(SUM(CASE WHEN cb = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
        |       CAST(SUM(CASE WHEN cb >= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
        |       CAST(SUM(CASE WHEN cb = 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS novelty
        |FROM bg JOIN c USING (bigram)
        |GROUP BY bg.doc_id
        |ORDER BY bg.doc_id""".stripMargin,

    "q_ttr" ->
      """SELECT doc_id,
        |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_types,
        |       CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |         / len(string_split(text, ' ')) AS ttr
        |FROM documents
        |ORDER BY ttr, doc_id
        |LIMIT 20""".stripMargin,

    "q_filter_funnel" ->
      """WITH r AS (
        |  SELECT CASE
        |    WHEN n_chars < 100 THEN 'too_short'
        |    WHEN n_chars > 400 THEN 'too_long'
        |    WHEN CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |           / len(string_split(text, ' ')) < 0.45 THEN 'too_repetitive'
        |    ELSE 'kept' END AS rule, n_chars
        |  FROM documents)
        |SELECT rule, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM r GROUP BY rule
        |ORDER BY rule""".stripMargin,

    // mirrors the Spark side's hub-shingle df cap (maxDf = 20): hub
    // shingles are dropped before the join on BOTH engines
    "q_decontaminate" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |pos AS (SELECT doc_id, l, unnest(generate_series(1, len(l) - 2)) AS i FROM tok),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(l[i:i+2], ' ') AS shingle FROM pos),
        |hub AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) > 20),
        |kept AS (SELECT sh.* FROM sh ANTI JOIN hub USING (shingle))
        |SELECT c.doc_id AS corpus_doc, b.doc_id AS bench_doc, COUNT(*) AS n_shared
        |FROM kept c JOIN kept b ON c.shingle = b.shingle
        |WHERE b.doc_id % 100 = 0 AND c.doc_id % 100 <> 0
        |GROUP BY 1, 2 HAVING COUNT(*) >= 2
        |ORDER BY corpus_doc, bench_doc""".stripMargin,

    "q_token_pack" ->
      """WITH s AS (SELECT doc_id,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS tok FROM documents),
        |c AS (SELECT doc_id, tok,
        |        SUM(tok) OVER (ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM s)
        |SELECT CAST(floor((cum - tok) / 4000.0) AS BIGINT) AS shard,
        |       COUNT(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS shard_tokens,
        |       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM c GROUP BY 1
        |ORDER BY 1""".stripMargin,

    "q_block_dedup" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |b AS (SELECT doc_id, l,
        |        unnest(generate_series(0, CAST(ceil(len(l) / 20.0) AS BIGINT) - 1)) AS b_idx
        |      FROM tok),
        |h AS (SELECT doc_id, b_idx,
        |        md5(array_to_string(l[b_idx*20+1 : b_idx*20+20], ' ')) AS h
        |      FROM b),
        |r AS (SELECT doc_id, b_idx,
        |        ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, b_idx) AS rn
        |      FROM h)
        |SELECT doc_id, COUNT(*) AS n_blocks,
        |       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |       CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
        |       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS kept_frac
        |FROM r GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    "q_chunk_overlap" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS l,
        |        CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM documents),
        |p AS (SELECT doc_id, l, n, unnest(generate_series(0, n - 1, 40)) AS start FROM tok)
        |SELECT doc_id, CAST(start // 40 AS BIGINT) AS chunk_id,
        |       least(50, n - start) AS n_tok,
        |       md5(array_to_string(l[start+1 : start+50], ' ')) AS chunk_hash
        |FROM p
        |ORDER BY doc_id, chunk_id""".stripMargin,

    "q_repetition" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |p AS (SELECT doc_id, l, n, unnest(generate_series(1, len(l) - n + 1)) AS i
        |      FROM tok CROSS JOIN (SELECT unnest([1, 2, 3]) AS n)),
        |gr AS (SELECT doc_id, CAST(n AS INT) AS gram_n,
        |         array_to_string(l[i : i+n-1], ' ') AS g FROM p),
        |c AS (SELECT doc_id, gram_n, g, COUNT(*) AS c FROM gr GROUP BY 1, 2, 3)
        |SELECT doc_id, gram_n, CAST(SUM(c) AS BIGINT) AS n_grams,
        |       CAST(MAX(c) AS BIGINT) AS top_count,
        |       CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS BIGINT) AS top_frac
        |FROM c GROUP BY doc_id, gram_n
        |ORDER BY doc_id, gram_n""".stripMargin,

    "q_pmi_colloc" ->
      """WITH tok AS (SELECT string_split(text, ' ') AS l FROM documents),
        |u AS (SELECT unnest(l) AS tok FROM tok),
        |uc AS (SELECT tok, COUNT(*) AS c FROM u GROUP BY tok),
        |p AS (SELECT l, unnest(generate_series(1, len(l) - 1)) AS i FROM tok),
        |bg AS (SELECT l[i] || ' ' || l[i+1] AS g FROM p),
        |b AS (SELECT g, COUNT(*) AS c_xy FROM bg GROUP BY g),
        |n AS (SELECT CAST(SUM(c_xy) AS BIGINT) AS n_bg FROM b),
        |b2 AS (SELECT g, c_xy, string_split(g, ' ')[1] AS t1, string_split(g, ' ')[2] AS t2
        |       FROM b WHERE c_xy >= 20)
        |SELECT b2.g, CAST(b2.c_xy AS BIGINT) AS c_xy,
        |       CAST(u1.c AS BIGINT) AS c_x, CAST(u2.c AS BIGINT) AS c_y,
        |       CAST(b2.c_xy * n.n_bg * 1000000 // (u1.c * u2.c) AS BIGINT) AS pmi_ppm
        |FROM b2 CROSS JOIN n
        |JOIN uc u1 ON b2.t1 = u1.tok
        |JOIN uc u2 ON b2.t2 = u2.tok
        |ORDER BY pmi_ppm DESC, g
        |LIMIT 30""".stripMargin,

    "q_cdc_chunks" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |c AS (SELECT doc_id, l, len(l) AS n,
        |    list_append(
        |      CASE WHEN len(l) >= 2 THEN
        |        list_filter(generate_series(2, len(l)),
        |          j -> ((('0x' || substr(md5(array_to_string(l[j-1:j], ' ')), 1, 8))::BIGINT & 2147483647) % 8 = 0)
        |               AND j < len(l))
        |      ELSE CAST([] AS BIGINT[]) END,
        |      len(l)) AS ends
        |  FROM tok WHERE len(l) >= 1),
        |d AS (SELECT doc_id, n, l, ends,
        |    list_transform(generate_series(1, len(ends)),
        |      i -> CASE WHEN i = 1 THEN 1 ELSE ends[i-1] + 1 END) AS starts
        |  FROM c),
        |e AS (SELECT doc_id, n, ends, starts,
        |    list_transform(generate_series(1, len(ends)), i -> ends[i] - starts[i] + 1) AS lens,
        |    list_transform(generate_series(1, len(ends)),
        |      i -> md5(array_to_string(l[starts[i]:ends[i]], ' '))) AS fps
        |  FROM d)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_toks,
        |  CAST(len(lens) AS BIGINT) AS n_chunks,
        |  CAST(list_min(lens) AS BIGINT) AS min_len,
        |  CAST(list_max(lens) AS BIGINT) AS max_len,
        |  md5(array_to_string(fps, ',')) AS fp_sig
        |FROM e
        |ORDER BY doc_id""".stripMargin,

    "q_chunk_dedup" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |c AS (SELECT doc_id, l, len(l) AS n,
        |    list_append(
        |      CASE WHEN len(l) >= 2 THEN
        |        list_filter(generate_series(2, len(l)),
        |          j -> ((('0x' || substr(md5(array_to_string(l[j-1:j], ' ')), 1, 8))::BIGINT & 2147483647) % 8 = 0)
        |               AND j < len(l))
        |      ELSE CAST([] AS BIGINT[]) END,
        |      len(l)) AS ends
        |  FROM tok WHERE len(l) >= 1),
        |d AS (SELECT doc_id, n, l, ends,
        |    list_transform(generate_series(1, len(ends)),
        |      i -> CASE WHEN i = 1 THEN 1 ELSE ends[i-1] + 1 END) AS starts
        |  FROM c),
        |e AS (SELECT doc_id, n, ends, starts,
        |    list_transform(generate_series(1, len(ends)), i -> ends[i] - starts[i] + 1) AS lens,
        |    list_transform(generate_series(1, len(ends)),
        |      i -> md5(array_to_string(l[starts[i]:ends[i]], ' '))) AS fps
        |  FROM d),
        |x AS (SELECT doc_id, n, UNNEST(fps) AS fp, UNNEST(lens) AS len FROM e),
        |f AS (SELECT fp, COUNT(*) AS cnt FROM x GROUP BY fp)
        |SELECT doc_id, CAST(MAX(n) AS BIGINT) AS n_toks,
        |  COUNT(*) AS n_chunks,
        |  CAST(SUM(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
        |  CAST(FLOOR(1000000.0 * SUM(CASE WHEN cnt >= 2 THEN len ELSE 0 END) / MAX(n)) AS BIGINT) AS dup_token_ppm
        |FROM x JOIN f USING (fp)
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    "q_winnowing" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |g AS (SELECT doc_id,
        |        list_transform(generate_series(1, len(l) - 3),
        |          i -> md5(array_to_string(l[i : i+3], ' '))) AS hs
        |      FROM tok WHERE len(l) >= 4),
        |f AS (SELECT doc_id, CAST(len(hs) AS BIGINT) AS n_grams,
        |        list_distinct(list_transform(
        |          generate_series(1, greatest(len(hs) - 4, 1)),
        |          j -> list_min(hs[j : j+4]))) AS fps
        |      FROM g)
        |SELECT doc_id, n_grams, CAST(len(fps) AS BIGINT) AS n_fp,
        |       list_min(fps) AS min_fp,
        |       md5(array_to_string(list_sort(fps), ',')) AS fp_sig
        |FROM f
        |ORDER BY doc_id""".stripMargin,

    "q_doclen_hist" ->
      """WITH s AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM documents),
        |b AS (SELECT n, CAST(length(bin(n)) AS INT) AS bucket FROM s)
        |SELECT bucket,
        |       CAST(2 ** (bucket - 1) AS BIGINT) AS lo,
        |       CAST(2 ** bucket AS BIGINT) - 1 AS hi,
        |       COUNT(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS sum_tokens
        |FROM b GROUP BY bucket
        |ORDER BY bucket""".stripMargin,

    // iterative BPE training: per round, pair-count CTE + 1-row merge
    // election + a recursive-CTE greedy left-to-right merge rewrite —
    // the same fold Spark's aggregate() HOF runs
    "q_bpe_train" -> bpeTrainOracle(4),
    "q_bpe_encode" -> bpeEncodeOracle(4),

    // unigram-LM Viterbi encode: the DP replayed as a rolling-window
    // recursive CTE (dp[i] needs dp[i-1..i-4]; the working table only
    // exposes the previous step, so each row CARRIES the last four dp
    // cells as columns). least() ignores NULLs — the invalid-prefix /
    // vocab-miss candidates — and the (cost, pieces) lexicographic
    // tie-break is the two nested least() calls.
    "q_unigram_encode" ->
      """WITH RECURSIVE
        |dt AS MATERIALIZED (
        |  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        |  WHERE length(tok) >= 1 GROUP BY doc_id, tok),
        |toks AS MATERIALIZED (SELECT tok, CAST(SUM(c) AS BIGINT) AS c FROM dt GROUP BY tok),
        |p0 AS (SELECT tok, c, unnest(generate_series(1, length(tok))) AS i FROM toks),
        |p1 AS (SELECT tok, c, i, unnest([1,2,3,4]) AS l FROM p0),
        |inv AS MATERIALIZED (
        |  SELECT substr(tok, CAST(i AS INT), CAST(l AS INT)) AS piece,
        |         CAST(SUM(c) AS BIGINT) AS cnt
        |  FROM p1 WHERE i + l - 1 <= length(tok) GROUP BY 1),
        |vocab AS MATERIALIZED (
        |  SELECT piece, CAST(40 - length(bin(cnt)) AS BIGINT) AS cost
        |  FROM inv WHERE length(piece) = 1
        |  UNION ALL
        |  SELECT piece, CAST(40 - length(bin(cnt)) AS BIGINT) AS cost FROM
        |    (SELECT piece, cnt FROM inv WHERE length(piece) >= 2
        |     ORDER BY cnt DESC, piece LIMIT 64)),
        |dp AS (
        |  SELECT tok, length(tok) AS len, 0 AS i,
        |         CAST(0 AS BIGINT) AS c0, CAST(NULL AS BIGINT) AS c1,
        |         CAST(NULL AS BIGINT) AS c2, CAST(NULL AS BIGINT) AS c3,
        |         CAST(0 AS BIGINT) AS n0, CAST(NULL AS BIGINT) AS n1,
        |         CAST(NULL AS BIGINT) AS n2, CAST(NULL AS BIGINT) AS n3
        |  FROM toks
        |  UNION ALL
        |  SELECT tok, len, i,
        |         least(x1, x2, x3, x4) AS c0, pc0 AS c1, pc1 AS c2, pc2 AS c3,
        |         least(CASE WHEN x1 = least(x1, x2, x3, x4) THEN pn0 + 1 END,
        |               CASE WHEN x2 = least(x1, x2, x3, x4) THEN pn1 + 1 END,
        |               CASE WHEN x3 = least(x1, x2, x3, x4) THEN pn2 + 1 END,
        |               CASE WHEN x4 = least(x1, x2, x3, x4) THEN pn3 + 1 END) AS n0,
        |         pn0 AS n1, pn1 AS n2, pn2 AS n3
        |  FROM (
        |    SELECT dp.tok, dp.len, dp.i + 1 AS i,
        |           dp.c0 AS pc0, dp.c1 AS pc1, dp.c2 AS pc2,
        |           dp.n0 AS pn0, dp.n1 AS pn1, dp.n2 AS pn2, dp.n3 AS pn3,
        |           dp.c0 + v1.cost AS x1, dp.c1 + v2.cost AS x2,
        |           dp.c2 + v3.cost AS x3, dp.c3 + v4.cost AS x4
        |    FROM dp
        |    LEFT JOIN vocab v1 ON v1.piece = substr(dp.tok, dp.i + 1, 1)
        |    LEFT JOIN vocab v2 ON v2.piece = substr(dp.tok, dp.i, 2)
        |    LEFT JOIN vocab v3 ON v3.piece = substr(dp.tok, dp.i - 1, 3)
        |    LEFT JOIN vocab v4 ON v4.piece = substr(dp.tok, dp.i - 2, 4)
        |    WHERE dp.i < dp.len) s),
        |enc AS (SELECT tok, n0 AS np, c0 AS cost FROM dp WHERE i = len)
        |SELECT dt.doc_id, CAST(SUM(dt.c) AS BIGINT) AS n_words,
        |       CAST(SUM(dt.c * enc.np) AS BIGINT) AS n_pieces,
        |       CAST(SUM(dt.c * enc.cost) AS BIGINT) AS cost_units
        |FROM dt JOIN enc USING (tok)
        |GROUP BY dt.doc_id
        |ORDER BY dt.doc_id""".stripMargin,

    // positional postings for the phrase's terms only; adjacency
    // expressed as equi-joins on (doc, pos − offset)
    "q_phrase_search" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |p AS (SELECT doc_id, l, unnest(generate_series(1, len(l))) AS pos FROM tok),
        |el AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos, l[pos] AS term FROM p),
        |w1 AS (SELECT doc_id, pos FROM el WHERE term = 'data'),
        |w2 AS (SELECT doc_id, pos FROM el WHERE term = 'join')
        |SELECT w1.doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches,
        |       CAST(MIN(w1.pos) AS BIGINT) AS first_pos
        |FROM w1 JOIN w2 ON w1.doc_id = w2.doc_id AND w2.pos = w1.pos + 1
        |GROUP BY w1.doc_id
        |ORDER BY w1.doc_id""".stripMargin,

    // exact micro-int cosine replayed per (anchor, wrong-label) pair;
    // the ppm snap text is Dedup.cosPpmSql verbatim
    // margin-criterion bitext mining: the dense lang×lang cosine
    // matrix, per-side k-NN sums, distance margin 2k·cos − Σx − Σy,
    // mined iff mutual-best by margin (forward ∩ backward)
    "q_bitext_mine" ->
      s"""WITH e AS (SELECT d.doc_id, d.lang,
        |    list_transform(em.embedding,
        |      x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS m
        |  FROM documents d JOIN embeddings em ON d.doc_id = em.vec_id),
        |nrm AS (SELECT doc_id, lang, m,
        |        CAST(list_sum(list_transform(m, x -> x * x)) AS BIGINT) AS nn FROM e),
        |x AS (SELECT doc_id AS src_id, m AS mx, nn AS aa FROM nrm WHERE lang = 'en'),
        |y AS (SELECT doc_id AS tgt_id, m AS my, nn AS bb FROM nrm WHERE lang = 'de'),
        |p0 AS (SELECT src_id, tgt_id,
        |        CAST(list_sum(list_transform(generate_series(1, len(mx)),
        |          i -> mx[i] * my[i])) AS BIGINT) AS dot, aa, bb
        |      FROM x CROSS JOIN y),
        |p AS (SELECT src_id, tgt_id, ${operators.Dedup.cosPpmSql} AS cos_ppm FROM p0),
        |dx AS (SELECT src_id, CAST(SUM(cos_ppm) AS BIGINT) AS dx FROM (
        |        SELECT src_id, cos_ppm, ROW_NUMBER() OVER (
        |          PARTITION BY src_id ORDER BY cos_ppm DESC, tgt_id) AS rn FROM p)
        |      WHERE rn <= 4 GROUP BY src_id),
        |dy AS (SELECT tgt_id, CAST(SUM(cos_ppm) AS BIGINT) AS dy FROM (
        |        SELECT tgt_id, cos_ppm, ROW_NUMBER() OVER (
        |          PARTITION BY tgt_id ORDER BY cos_ppm DESC, src_id) AS rn FROM p)
        |      WHERE rn <= 4 GROUP BY tgt_id),
        |sc AS (SELECT p.src_id, p.tgt_id, p.cos_ppm,
        |        CAST(8 * p.cos_ppm - dx.dx - dy.dy AS BIGINT) AS margin2k
        |      FROM p JOIN dx USING (src_id) JOIN dy USING (tgt_id)),
        |f AS (SELECT src_id, tgt_id, cos_ppm, margin2k, ROW_NUMBER() OVER (
        |        PARTITION BY src_id ORDER BY margin2k DESC, tgt_id) AS rf FROM sc),
        |b AS (SELECT src_id, tgt_id, ROW_NUMBER() OVER (
        |        PARTITION BY tgt_id ORDER BY margin2k DESC, src_id) AS rb FROM sc)
        |SELECT f.src_id, f.tgt_id, f.cos_ppm, f.margin2k
        |FROM f JOIN b ON f.src_id = b.src_id AND f.tgt_id = b.tgt_id
        |WHERE f.rf = 1 AND b.rb = 1
        |ORDER BY f.src_id""".stripMargin,

    "q_distinct_ngrams" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |g AS (SELECT doc_id,
        |    CASE WHEN len(l) < 2 THEN []::VARCHAR[]
        |         ELSE list_transform(generate_series(1, len(l) - 1),
        |                i -> l[i] || ' ' || l[i + 1]) END AS g2,
        |    CASE WHEN len(l) < 3 THEN []::VARCHAR[]
        |         ELSE list_transform(generate_series(1, len(l) - 2),
        |                i -> l[i] || ' ' || l[i + 1] || ' ' || l[i + 2]) END AS g3
        |  FROM tok)
        |SELECT doc_id,
        |  CAST(len(g2) AS BIGINT) AS n2,
        |  CAST(len(list_distinct(g2)) AS BIGINT) AS u2,
        |  CAST(len(list_distinct(g2)) * 1000000 // GREATEST(len(g2), 1) AS BIGINT) AS d2_ppm,
        |  CAST(len(g3) AS BIGINT) AS n3,
        |  CAST(len(list_distinct(g3)) AS BIGINT) AS u3,
        |  CAST(len(list_distinct(g3)) * 1000000 // GREATEST(len(g3), 1) AS BIGINT) AS d3_ppm
        |FROM g
        |ORDER BY doc_id""".stripMargin,

    "q_unicode_norm" ->
      """WITH r AS (SELECT doc_id,
        |    text || ' cafe' || chr(769) || ' zu' || chr(776) || 'rich' AS raw
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(length(raw) AS BIGINT) AS len_raw,
        |  CAST(length(nfc_normalize(raw)) AS BIGINT) AS len_nfc,
        |  CAST(length(raw) - length(nfc_normalize(raw)) AS BIGINT) AS n_composed,
        |  md5(nfc_normalize(raw)) AS nfc_hash
        |FROM r
        |ORDER BY doc_id""".stripMargin,

    "q_zipf_audit" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |c AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY tok),
        |r AS (SELECT c, CAST(length(bin(CAST(ROW_NUMBER() OVER (
        |        ORDER BY c DESC, tok) AS BIGINT))) AS BIGINT) AS octave FROM c),
        |o AS (SELECT octave, CAST(COUNT(*) AS BIGINT) AS n_types,
        |        CAST(SUM(c) AS BIGINT) AS mass,
        |        CAST(MAX(c) AS BIGINT) AS top_count
        |      FROM r GROUP BY octave)
        |SELECT octave, n_types, mass, top_count,
        |  CAST(CASE WHEN LAG(mass) OVER (ORDER BY octave) IS NULL THEN NULL
        |       ELSE mass * 1000000 // LAG(mass) OVER (ORDER BY octave) END
        |    AS BIGINT) AS mass_ratio_ppm
        |FROM o
        |ORDER BY octave""".stripMargin,

    "q_hard_negatives" ->
      s"""WITH q AS (SELECT vec_id, label,
        |    list_transform(embedding,
        |      x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS m
        |  FROM embeddings),
        |w AS (SELECT vec_id, CAST(label AS BIGINT) AS label, m,
        |        CAST(list_sum(list_transform(m, x -> x * x)) AS BIGINT) AS aa FROM q),
        |a AS (SELECT * FROM w
        |      WHERE (('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT
        |              & 2147483647) % 10 = 0),
        |p AS (SELECT a.vec_id AS anchor_id, b.vec_id AS neg_id,
        |        CAST(list_sum(list_transform(generate_series(1, len(a.m)),
        |          i -> a.m[i] * b.m[i])) AS BIGINT) AS dot,
        |        a.aa AS aa, b.aa AS bb
        |      FROM a JOIN w b ON a.label <> b.label),
        |s AS (SELECT anchor_id, neg_id, ${operators.Dedup.cosPpmSql} AS cos_ppm FROM p),
        |r AS (SELECT anchor_id, neg_id, cos_ppm,
        |        CAST(ROW_NUMBER() OVER (
        |          PARTITION BY anchor_id ORDER BY cos_ppm DESC, neg_id) AS BIGINT) AS rnk
        |      FROM s)
        |SELECT anchor_id, rnk, neg_id, cos_ppm FROM r WHERE rnk <= 3
        |ORDER BY anchor_id, rnk""".stripMargin,

    // the greedy MMR trajectory unrolled as a 5-round CTE chain; every
    // pick and penalty is the shared micro-int cosine ppm
    "q_mmr_rerank" -> {
      val cos = operators.Dedup.cosPpmSql
      val rounds = (2 to 5).map { r =>
        s"""sel${r - 1} AS (SELECT vec_id FROM s${r - 1}${
          if (r > 2) s" UNION ALL SELECT vec_id FROM sel${r - 2}" else ""}),
          |p$r AS (SELECT r.vec_id, r.rel_ppm, MAX(pr.sim_ppm) AS pen
          |        FROM rel r JOIN pr ON pr.ib = r.vec_id
          |          AND pr.ia IN (SELECT vec_id FROM sel${r - 1})
          |        WHERE r.vec_id NOT IN (SELECT vec_id FROM sel${r - 1})
          |        GROUP BY 1, 2),
          |s$r AS (SELECT vec_id, rel_ppm, CAST(pen AS BIGINT) AS pen
          |        FROM p$r ORDER BY rel_ppm - pen DESC, vec_id LIMIT 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH q AS (SELECT vec_id,
        |    list_transform(embedding,
        |      x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS m
        |  FROM embeddings),
        |w AS (SELECT vec_id, m,
        |        CAST(list_sum(list_transform(m, x -> x * x)) AS BIGINT) AS aa FROM q),
        |qv AS (SELECT m AS mq, aa AS qq FROM w WHERE vec_id = 0),
        |rel0 AS (SELECT w.vec_id, w.m, w.aa AS ca, qv.qq AS bb, w.aa,
        |           CAST(list_sum(list_transform(generate_series(1, len(w.m)),
        |             i -> w.m[i] * qv.mq[i])) AS BIGINT) AS dot
        |         FROM w, qv WHERE w.vec_id <> 0),
        |rel1 AS (SELECT vec_id, m, ca, $cos AS rel_ppm FROM rel0),
        |rel AS (SELECT * FROM rel1 ORDER BY rel_ppm DESC, vec_id LIMIT 16),
        |pr0 AS (SELECT a.vec_id AS ia, b.vec_id AS ib,
        |          CAST(list_sum(list_transform(generate_series(1, len(a.m)),
        |            i -> a.m[i] * b.m[i])) AS BIGINT) AS dot,
        |          a.ca AS aa, b.ca AS bb
        |        FROM rel a, rel b WHERE a.vec_id <> b.vec_id),
        |pr AS (SELECT ia, ib, $cos AS sim_ppm FROM pr0),
        |s1 AS (SELECT vec_id, rel_ppm, CAST(0 AS BIGINT) AS pen
        |       FROM rel ORDER BY rel_ppm DESC, vec_id LIMIT 1),
        |$rounds
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS rnk, vec_id, rel_ppm, pen AS penalty_ppm,
        |         rel_ppm - pen AS mmr_score FROM s1
        |  UNION ALL SELECT 2, vec_id, rel_ppm, pen, rel_ppm - pen FROM s2
        |  UNION ALL SELECT 3, vec_id, rel_ppm, pen, rel_ppm - pen FROM s3
        |  UNION ALL SELECT 4, vec_id, rel_ppm, pen, rel_ppm - pen FROM s4
        |  UNION ALL SELECT 5, vec_id, rel_ppm, pen, rel_ppm - pen FROM s5)
        |ORDER BY rnk""".stripMargin
    },

    // the Rademacher matrix rebuilt from md5('rp_j_d') parity; both
    // squared distances re-derived per-dimension; one ppm division
    "q_random_proj" ->
      """WITH m AS (
        |  SELECT vec_id,
        |         list_transform(embedding,
        |           x -> FLOOR(CAST(x AS DOUBLE) * 1000 + 0.5)) AS m
        |  FROM embeddings
        |  WHERE (('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT
        |          & 2147483647) % 10 = 0),
        |el AS (SELECT vec_id, generate_subscripts(m, 1) AS d, unnest(m) AS v FROM m),
        |sg AS (SELECT j, d,
        |         CASE WHEN ('0x' || substr(md5('rp_' || j || '_' || d), 1, 8))::BIGINT
        |                   % 2 = 0
        |              THEN 1 ELSE -1 END AS sgn
        |       FROM generate_series(1, 16) s1(j), generate_series(1, 64) s2(d)),
        |y AS (SELECT vec_id, j, CAST(SUM(sgn * v) AS BIGINT) AS y
        |      FROM el JOIN sg USING (d) GROUP BY 1, 2),
        |po AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |              CAST(SUM((a.v - b.v) * (a.v - b.v)) AS BIGINT) AS d2_orig
        |       FROM el a JOIN el b ON a.d = b.d AND a.vec_id < b.vec_id
        |       GROUP BY 1, 2),
        |pp AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |              CAST(SUM((a.y - b.y) * (a.y - b.y)) AS BIGINT) AS d2_proj
        |       FROM y a JOIN y b ON a.j = b.j AND a.vec_id < b.vec_id
        |       GROUP BY 1, 2)
        |SELECT id_a, id_b, d2_orig, d2_proj,
        |       d2_proj * 1000000 // (16 * d2_orig) AS ratio_ppm
        |FROM po JOIN pp USING (id_a, id_b)
        |WHERE d2_orig > 0
        |ORDER BY id_a, id_b""".stripMargin,

    // greedy longest-match recursion advances one PIECE per step; the
    // boundary guards on the length-k joins stop end-of-word overshoot
    "q_wordpiece_encode" ->
      """WITH RECURSIVE
        |dt AS MATERIALIZED (
        |  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        |  WHERE length(tok) >= 1 GROUP BY doc_id, tok),
        |toks AS MATERIALIZED (SELECT tok, CAST(SUM(c) AS BIGINT) AS c FROM dt GROUP BY tok),
        |q0 AS (SELECT tok, c, unnest(generate_series(1, length(tok))) AS i FROM toks),
        |q1 AS (SELECT tok, c, i, unnest([1,2,3,4]) AS l FROM q0),
        |inv AS MATERIALIZED (
        |  SELECT substr(tok, CAST(i AS INT), CAST(l AS INT)) AS piece,
        |         CAST(SUM(c) AS BIGINT) AS cnt
        |  FROM q1 WHERE i + l - 1 <= length(tok) GROUP BY 1),
        |vocab AS MATERIALIZED (
        |  SELECT piece, CAST(40 - length(bin(cnt)) AS BIGINT) AS cost
        |  FROM inv WHERE length(piece) = 1
        |  UNION ALL
        |  SELECT piece, CAST(40 - length(bin(cnt)) AS BIGINT) AS cost FROM
        |    (SELECT piece, cnt FROM inv WHERE length(piece) >= 2
        |     ORDER BY cnt DESC, piece LIMIT 64)),
        |wp AS (
        |  SELECT tok, CAST(1 AS BIGINT) AS pos,
        |         CAST(0 AS BIGINT) AS np, CAST(0 AS BIGINT) AS cost
        |  FROM toks
        |  UNION ALL
        |  SELECT tok, pos + k, np + 1, cost + c FROM (
        |    SELECT wp.tok, wp.pos, wp.np, wp.cost,
        |      CASE WHEN v4.cost IS NOT NULL THEN 4
        |           WHEN v3.cost IS NOT NULL THEN 3
        |           WHEN v2.cost IS NOT NULL THEN 2 ELSE 1 END AS k,
        |      CASE WHEN v4.cost IS NOT NULL THEN v4.cost
        |           WHEN v3.cost IS NOT NULL THEN v3.cost
        |           WHEN v2.cost IS NOT NULL THEN v2.cost ELSE v1.cost END AS c
        |    FROM wp
        |    LEFT JOIN vocab v4 ON wp.pos + 3 <= length(wp.tok)
        |      AND v4.piece = substr(wp.tok, CAST(wp.pos AS INT), 4)
        |    LEFT JOIN vocab v3 ON wp.pos + 2 <= length(wp.tok)
        |      AND v3.piece = substr(wp.tok, CAST(wp.pos AS INT), 3)
        |    LEFT JOIN vocab v2 ON wp.pos + 1 <= length(wp.tok)
        |      AND v2.piece = substr(wp.tok, CAST(wp.pos AS INT), 2)
        |    JOIN vocab v1 ON v1.piece = substr(wp.tok, CAST(wp.pos AS INT), 1)
        |    WHERE wp.pos <= length(wp.tok)) s),
        |enc AS (SELECT tok, np, cost FROM wp WHERE pos = length(tok) + 1)
        |SELECT dt.doc_id, CAST(SUM(dt.c) AS BIGINT) AS n_words,
        |       CAST(SUM(dt.c * enc.np) AS BIGINT) AS n_pieces,
        |       CAST(SUM(dt.c * enc.cost) AS BIGINT) AS cost_units
        |FROM dt JOIN enc USING (tok)
        |GROUP BY dt.doc_id
        |ORDER BY dt.doc_id""".stripMargin,

    // deploy-time vocabulary mismatch: vocab from the CLEAN corpus,
    // tokens from the vowel→digit corrupted third — the [UNK] arm
    // (LEFT-joined v1, fixed cost 63, per-doc nu counter)
    "q_wordpiece_unk" ->
      """WITH RECURSIVE
        |dt AS MATERIALIZED (
        |  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM (SELECT doc_id, unnest(string_split(
        |          CASE WHEN doc_id % 3 = 0 THEN translate(text, 'aei', '015')
        |               ELSE text END, ' ')) AS tok
        |        FROM documents)
        |  WHERE length(tok) >= 1 GROUP BY doc_id, tok),
        |toks AS MATERIALIZED (SELECT tok, CAST(SUM(c) AS BIGINT) AS c FROM dt GROUP BY tok),
        |ct AS MATERIALIZED (
        |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |  WHERE length(tok) >= 1 GROUP BY tok),
        |q0 AS (SELECT tok, c, unnest(generate_series(1, length(tok))) AS i FROM ct),
        |q1 AS (SELECT tok, c, i, unnest([1,2,3,4]) AS l FROM q0),
        |inv AS MATERIALIZED (
        |  SELECT substr(tok, CAST(i AS INT), CAST(l AS INT)) AS piece,
        |         CAST(SUM(c) AS BIGINT) AS cnt
        |  FROM q1 WHERE i + l - 1 <= length(tok) GROUP BY 1),
        |vocab AS MATERIALIZED (
        |  SELECT piece, CAST(40 - length(bin(cnt)) AS BIGINT) AS cost
        |  FROM inv WHERE length(piece) = 1
        |  UNION ALL
        |  SELECT piece, CAST(40 - length(bin(cnt)) AS BIGINT) AS cost FROM
        |    (SELECT piece, cnt FROM inv WHERE length(piece) >= 2
        |     ORDER BY cnt DESC, piece LIMIT 64)),
        |wp AS (
        |  SELECT tok, CAST(1 AS BIGINT) AS pos, CAST(0 AS BIGINT) AS np,
        |         CAST(0 AS BIGINT) AS nu, CAST(0 AS BIGINT) AS cost
        |  FROM toks
        |  UNION ALL
        |  SELECT tok, pos + k, np + 1, nu + u, cost + c FROM (
        |    SELECT wp.tok, wp.pos, wp.np, wp.nu, wp.cost,
        |      CASE WHEN v4.cost IS NOT NULL THEN 4
        |           WHEN v3.cost IS NOT NULL THEN 3
        |           WHEN v2.cost IS NOT NULL THEN 2 ELSE 1 END AS k,
        |      CASE WHEN v4.cost IS NOT NULL THEN v4.cost
        |           WHEN v3.cost IS NOT NULL THEN v3.cost
        |           WHEN v2.cost IS NOT NULL THEN v2.cost
        |           WHEN v1.cost IS NOT NULL THEN v1.cost
        |           ELSE 63 END AS c,
        |      CASE WHEN v4.cost IS NULL AND v3.cost IS NULL
        |            AND v2.cost IS NULL AND v1.cost IS NULL
        |           THEN 1 ELSE 0 END AS u
        |    FROM wp
        |    LEFT JOIN vocab v4 ON wp.pos + 3 <= length(wp.tok)
        |      AND v4.piece = substr(wp.tok, CAST(wp.pos AS INT), 4)
        |    LEFT JOIN vocab v3 ON wp.pos + 2 <= length(wp.tok)
        |      AND v3.piece = substr(wp.tok, CAST(wp.pos AS INT), 3)
        |    LEFT JOIN vocab v2 ON wp.pos + 1 <= length(wp.tok)
        |      AND v2.piece = substr(wp.tok, CAST(wp.pos AS INT), 2)
        |    LEFT JOIN vocab v1 ON v1.piece = substr(wp.tok, CAST(wp.pos AS INT), 1)
        |    WHERE wp.pos <= length(wp.tok)) s),
        |enc AS (SELECT tok, np, nu, cost FROM wp WHERE pos = length(tok) + 1)
        |SELECT dt.doc_id, CAST(SUM(dt.c) AS BIGINT) AS n_words,
        |       CAST(SUM(dt.c * enc.np) AS BIGINT) AS n_pieces,
        |       CAST(SUM(dt.c * enc.nu) AS BIGINT) AS n_unk,
        |       CAST(SUM(dt.c * enc.cost) AS BIGINT) AS cost_units
        |FROM dt JOIN enc USING (tok)
        |GROUP BY dt.doc_id
        |ORDER BY dt.doc_id""".stripMargin,

    // the Viterbi DP extended with a path column: the tie CASE picks
    // the smallest piece length among (min cost, min pieces), then the
    // E-step usage agg and M-step re-estimate replay integer-exact
    "q_unigram_train" ->
      """WITH RECURSIVE
        |dt AS MATERIALIZED (
        |  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        |  WHERE length(tok) >= 1 GROUP BY doc_id, tok),
        |toks AS MATERIALIZED (SELECT tok, CAST(SUM(c) AS BIGINT) AS c FROM dt GROUP BY tok),
        |q0 AS (SELECT tok, c, unnest(generate_series(1, length(tok))) AS i FROM toks),
        |q1 AS (SELECT tok, c, i, unnest([1,2,3,4]) AS l FROM q0),
        |inv AS MATERIALIZED (
        |  SELECT substr(tok, CAST(i AS INT), CAST(l AS INT)) AS piece,
        |         CAST(SUM(c) AS BIGINT) AS cnt
        |  FROM q1 WHERE i + l - 1 <= length(tok) GROUP BY 1),
        |vocab AS MATERIALIZED (
        |  SELECT piece, CAST(40 - length(bin(cnt)) AS BIGINT) AS cost
        |  FROM inv WHERE length(piece) = 1
        |  UNION ALL
        |  SELECT piece, CAST(40 - length(bin(cnt)) AS BIGINT) AS cost FROM
        |    (SELECT piece, cnt FROM inv WHERE length(piece) >= 2
        |     ORDER BY cnt DESC, piece LIMIT 64)),
        |dp AS (
        |  SELECT tok, length(tok) AS len, 0 AS i,
        |         CAST(0 AS BIGINT) AS c0, CAST(NULL AS BIGINT) AS c1,
        |         CAST(NULL AS BIGINT) AS c2, CAST(NULL AS BIGINT) AS c3,
        |         CAST(0 AS BIGINT) AS n0, CAST(NULL AS BIGINT) AS n1,
        |         CAST(NULL AS BIGINT) AS n2, CAST(NULL AS BIGINT) AS n3,
        |         CAST('' AS VARCHAR) AS p0, CAST(NULL AS VARCHAR) AS p1,
        |         CAST(NULL AS VARCHAR) AS p2, CAST(NULL AS VARCHAR) AS p3
        |  FROM toks
        |  UNION ALL
        |  SELECT tok, len, i, cmin AS c0, pc0 AS c1, pc1 AS c2, pc2 AS c3,
        |         nmin AS n0, pn0 AS n1, pn1 AS n2, pn2 AS n3,
        |         CASE WHEN x1 = cmin AND pn0 + 1 = nmin THEN pp0 || s1 || '|'
        |              WHEN x2 = cmin AND pn1 + 1 = nmin THEN pp1 || s2 || '|'
        |              WHEN x3 = cmin AND pn2 + 1 = nmin THEN pp2 || s3 || '|'
        |              WHEN x4 = cmin AND pn3 + 1 = nmin THEN pp3 || s4 || '|' END AS p0,
        |         pp0 AS p1, pp1 AS p2, pp2 AS p3
        |  FROM (
        |    SELECT *, least(x1, x2, x3, x4) AS cmin,
        |           least(CASE WHEN x1 = least(x1, x2, x3, x4) THEN pn0 + 1 END,
        |                 CASE WHEN x2 = least(x1, x2, x3, x4) THEN pn1 + 1 END,
        |                 CASE WHEN x3 = least(x1, x2, x3, x4) THEN pn2 + 1 END,
        |                 CASE WHEN x4 = least(x1, x2, x3, x4) THEN pn3 + 1 END) AS nmin
        |    FROM (
        |      SELECT dp.tok, dp.len, dp.i + 1 AS i,
        |             dp.c0 AS pc0, dp.c1 AS pc1, dp.c2 AS pc2,
        |             dp.n0 AS pn0, dp.n1 AS pn1, dp.n2 AS pn2, dp.n3 AS pn3,
        |             dp.p0 AS pp0, dp.p1 AS pp1, dp.p2 AS pp2, dp.p3 AS pp3,
        |             substr(dp.tok, dp.i + 1, 1) AS s1, substr(dp.tok, dp.i, 2) AS s2,
        |             substr(dp.tok, dp.i - 1, 3) AS s3, substr(dp.tok, dp.i - 2, 4) AS s4,
        |             dp.c0 + v1.cost AS x1, dp.c1 + v2.cost AS x2,
        |             dp.c2 + v3.cost AS x3, dp.c3 + v4.cost AS x4
        |      FROM dp
        |      LEFT JOIN vocab v1 ON v1.piece = substr(dp.tok, dp.i + 1, 1)
        |      LEFT JOIN vocab v2 ON v2.piece = substr(dp.tok, dp.i, 2)
        |      LEFT JOIN vocab v3 ON v3.piece = substr(dp.tok, dp.i - 1, 3)
        |      LEFT JOIN vocab v4 ON v4.piece = substr(dp.tok, dp.i - 2, 4)
        |      WHERE dp.i < dp.len) s0) s1x),
        |enc AS (SELECT tok, p0 AS path FROM dp WHERE i = len),
        |usage AS (
        |  SELECT piece, CAST(SUM(c) AS BIGINT) AS used FROM (
        |    SELECT t.c, unnest(string_split(e.path, '|')) AS piece
        |    FROM toks t JOIN enc e USING (tok)) u
        |  WHERE length(piece) >= 1 GROUP BY piece)
        |SELECT v.piece, v.cost AS cost_init,
        |       CAST(COALESCE(u.used, 0) AS BIGINT) AS used,
        |       CAST(40 - length(bin(u.used)) AS BIGINT) AS cost_new
        |FROM vocab v LEFT JOIN usage u ON u.piece = v.piece
        |ORDER BY v.piece""".stripMargin,

    // floor-log2 bigram LM replayed exactly: reference-slice counts,
    // bin-length costs, flat OOV=24, integer-ppm bits per bigram
    "q_perplexity" ->
      s"""$perplexityOracleCore
        |SELECT doc_id, lang, n_bigrams, cost_units, bits_ppm FROM px
        |ORDER BY doc_id""".stripMargin,

    // per-lang NTILE(3) over the shared perplexity frame — the CCNet
    // head/middle/tail cut, bucket boundaries engine-exact
    "q_ccnet_bucket" ->
      s"""$perplexityOracleCore,
        |b AS (SELECT lang, bits_ppm, n_bigrams,
        |        NTILE(3) OVER (PARTITION BY lang
        |                       ORDER BY bits_ppm, doc_id) AS bucket
        |      FROM px)
        |SELECT lang, CAST(bucket AS BIGINT) AS bucket,
        |       CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       MIN(bits_ppm) AS min_bits_ppm,
        |       MAX(bits_ppm) AS max_bits_ppm,
        |       CAST(SUM(n_bigrams) AS BIGINT) AS n_bigrams
        |FROM b GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    // integer-sqrt temperature weights: w = floor(sqrt(tokens)), all
    // shares exact bigint over the integer weight sum
    "q_sqrt_mixture" ->
      """WITH per AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |         CAST(SUM(len(regexp_extract_all(text, '[^ ]+'))) AS BIGINT) AS src_tokens
        |  FROM documents GROUP BY source),
        |w AS (SELECT *, CAST(FLOOR(SQRT(CAST(src_tokens AS DOUBLE))) AS BIGINT) AS w
        |      FROM per),
        |tot AS (SELECT CAST(SUM(w) AS BIGINT) AS w_total,
        |               CAST(SUM(src_tokens) AS BIGINT) AS total_tokens FROM w)
        |SELECT source, n_docs, src_tokens, w.w,
        |       w.w * 1000000 // t.w_total AS share_ppm,
        |       t.total_tokens * (w.w * 1000000 // t.w_total) // 1000000 AS sampled_tokens
        |FROM w CROSS JOIN tot t
        |ORDER BY source""".stripMargin,

    // rank profiles replayed with the same (cnt desc, gram asc) window
    // ties; absent-gram penalty folded closed-form like the NB oracle
    "q_ct_langid" ->
      """WITH g0 AS (SELECT doc_id, lang, text,
        |              unnest(generate_series(1, length(text) - 2)) AS i
        |            FROM documents WHERE length(text) >= 3),
        |gr AS (SELECT doc_id, lang, substr(text, CAST(i AS INT), 3) AS g,
        |         CAST(COUNT(*) AS BIGINT) AS c
        |       FROM g0 GROUP BY 1, 2, 3),
        |lp AS (SELECT cls, g, CAST(rl AS BIGINT) AS rl FROM (
        |         SELECT lang AS cls, g,
        |                ROW_NUMBER() OVER (PARTITION BY lang
        |                                   ORDER BY SUM(c) DESC, g) AS rl
        |         FROM gr WHERE doc_id % 2 = 0 GROUP BY lang, g) x
        |       WHERE rl <= 40),
        |dp AS (SELECT doc_id, lang, g, CAST(rd AS BIGINT) AS rd FROM (
        |         SELECT doc_id, lang, g,
        |                ROW_NUMBER() OVER (PARTITION BY doc_id
        |                                   ORDER BY c DESC, g) AS rd
        |         FROM gr WHERE doc_id % 2 = 1) x
        |       WHERE rd <= 40),
        |gains AS (SELECT dp.doc_id, lp.cls,
        |            CAST(SUM(40 - abs(dp.rd - lp.rl)) AS BIGINT) AS gain
        |          FROM dp JOIN lp USING (g) GROUP BY 1, 2),
        |dn AS (SELECT doc_id, lang, CAST(COUNT(*) AS BIGINT) AS np
        |       FROM dp GROUP BY 1, 2),
        |cl AS (SELECT DISTINCT cls FROM lp),
        |score AS (SELECT dn.doc_id, dn.lang, cl.cls,
        |            40 * dn.np - COALESCE(g.gain, 0) AS dist
        |          FROM dn CROSS JOIN cl
        |          LEFT JOIN gains g ON g.doc_id = dn.doc_id AND g.cls = cl.cls),
        |pred AS (SELECT doc_id, lang, cls AS pred_lang,
        |           ROW_NUMBER() OVER (PARTITION BY doc_id
        |                              ORDER BY dist, cls) AS rn
        |         FROM score)
        |SELECT lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
        |FROM pred WHERE rn = 1
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    // Naive Bayes replayed integer-exact: even/odd split, add-one
    // floor-log2 costs via the closed-form absent-token fold,
    // (cost, cls) lexicographic argmin, classes-squared matrix
    // the full integer-GD training replay, generated from the same
    // fragments the Spark plan uses (QualityModel.oracle*Sql)
    "q_logreg_train" -> QualityModel.oracleTrainSql,
    "q_calibrate" -> QualityModel.oracleCalibrateSql,

    // symmetric-delete spell linkage: DuckDB replays the deletion
    // neighborhood, the variant equi-join, and the levenshtein verify
    "q_symspell" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents
        |             UNION ALL
        |             SELECT unnest(string_split(p_name, ' ')) AS w FROM part),
        |v AS (SELECT w AS token, CAST(COUNT(*) AS BIGINT) AS cnt
        |      FROM tok WHERE length(w) >= 3 GROUP BY 1),
        |vars AS (SELECT DISTINCT token, cnt,
        |        unnest(list_distinct(list_prepend(token,
        |          list_transform(range(1, length(token) + 1),
        |            i -> substr(token, 1, i - 1)
        |                 || substr(token, i + 1, length(token)))))) AS var
        |      FROM v),
        |cand AS (SELECT DISTINCT a.token AS token, a.cnt AS cnt,
        |        b.token AS nb, b.cnt AS nb_cnt
        |      FROM vars a JOIN vars b ON a.var = b.var AND a.token <> b.token),
        |ok AS (SELECT * FROM cand
        |       WHERE levenshtein(token, nb) <= 1 AND nb_cnt > cnt),
        |best AS (SELECT token, cnt, nb, nb_cnt,
        |        ROW_NUMBER() OVER (PARTITION BY token
        |          ORDER BY nb_cnt DESC, nb ASC) AS rn FROM ok)
        |SELECT token, cnt, nb AS correction, nb_cnt AS corr_cnt
        |FROM best WHERE rn = 1 ORDER BY token""".stripMargin,
    "q_logreg_score" -> QualityModel.oracleScoreSql,
    "q_logreg_filter" -> QualityModel.oracleFilterSql,

    "q_nb_classify" ->
      """WITH tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM documents),
        |dt AS (SELECT doc_id, lang, tok, CAST(COUNT(*) AS BIGINT) AS c
        |       FROM tok GROUP BY 1, 2, 3),
        |train AS (SELECT * FROM dt WHERE doc_id % 2 = 0),
        |test AS (SELECT * FROM dt WHERE doc_id % 2 = 1),
        |ct AS (SELECT lang AS cls, tok, CAST(SUM(c) AS BIGINT) AS cnt
        |       FROM train GROUP BY 1, 2),
        |v AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v FROM ct),
        |cd AS (SELECT lang AS cls, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS nd
        |       FROM train GROUP BY 1),
        |td AS (SELECT CAST(SUM(nd) AS BIGINT) AS td FROM cd),
        |cs AS (SELECT tt.cls,
        |         CAST(length(bin(tt.total + v.v)) AS BIGINT) AS norm,
        |         CAST(length(bin(td.td)) - length(bin(cd.nd)) AS BIGINT) AS prior
        |       FROM (SELECT cls, CAST(SUM(cnt) AS BIGINT) AS total FROM ct GROUP BY cls) tt
        |       JOIN cd USING (cls) CROSS JOIN v CROSS JOIN td),
        |gains AS (SELECT t.doc_id, ct.cls,
        |            CAST(SUM(t.c * (length(bin(ct.cnt + 1)) - 1)) AS BIGINT) AS gain
        |          FROM test t JOIN ct USING (tok) GROUP BY 1, 2),
        |dn AS (SELECT doc_id, lang, CAST(SUM(c) AS BIGINT) AS n FROM test GROUP BY 1, 2),
        |score AS (SELECT dn.doc_id, dn.lang, cs.cls,
        |            cs.prior + (cs.norm - 1) * dn.n - COALESCE(g.gain, 0) AS cost
        |          FROM dn CROSS JOIN cs
        |          LEFT JOIN gains g ON g.doc_id = dn.doc_id AND g.cls = cs.cls),
        |pred AS (SELECT doc_id, lang, cls AS pred_lang,
        |           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY cost, cls) AS rn
        |         FROM score)
        |SELECT lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
        |FROM pred WHERE rn = 1
        |GROUP BY lang, pred_lang
        |ORDER BY lang, pred_lang""".stripMargin,

    // the same bit/probe CTEs collapsed to one-row totals; prediction
    // is k fixed-order IEEE multiplies of one division
    "q_bloom_saturation" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |p AS (SELECT doc_id, l, unnest(generate_series(1, len(l) - 2)) AS i FROM tok),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(l[i:i+2], ' ') AS shingle FROM p),
        |bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 100 = 0),
        |corpus AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 100 <> 0),
        |bits AS (SELECT DISTINCT
        |           (('0x' || substr(md5(CAST(r.range AS VARCHAR) || ':' || shingle), 1, 8))::BIGINT
        |             & 2147483647) % 4096 AS bit
        |         FROM bench, range(0, 4) r),
        |probes AS (SELECT doc_id, shingle, r.range AS r,
        |             (('0x' || substr(md5(CAST(r.range AS VARCHAR) || ':' || shingle), 1, 8))::BIGINT
        |               & 2147483647) % 4096 AS bit
        |           FROM corpus, range(0, 4) r),
        |positive AS (SELECT doc_id, shingle FROM probes JOIN bits USING (bit)
        |             GROUP BY doc_id, shingle HAVING COUNT(DISTINCT r) = 4),
        |nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS nb FROM positive),
        |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt
        |       FROM corpus c JOIN bench b USING (shingle)),
        |np AS (SELECT CAST(COUNT(*) AS BIGINT) AS np FROM corpus),
        |bs AS (SELECT CAST(COUNT(*) AS BIGINT) AS bits_set FROM bits),
        |bn AS (SELECT CAST(COUNT(*) AS BIGINT) AS bench_shingles FROM bench)
        |SELECT CAST(4096 AS BIGINT) AS m_bits, CAST(4 AS BIGINT) AS k_hashes,
        |       bench_shingles, bits_set,
        |       bits_set * 1000000 // 4096 AS fill_ppm,
        |       CAST(FLOOR(1000000.0 * (CAST(bits_set AS DOUBLE) / 4096.0)
        |         * (CAST(bits_set AS DOUBLE) / 4096.0)
        |         * (CAST(bits_set AS DOUBLE) / 4096.0)
        |         * (CAST(bits_set AS DOUBLE) / 4096.0)) AS BIGINT) AS fp_pred_ppm,
        |       (nb - nt) * 1000000 // GREATEST(np - nt, 1) AS fp_meas_ppm
        |FROM bs CROSS JOIN bn CROSS JOIN nb CROSS JOIN nt CROSS JOIN np""".stripMargin,

    // bloom filter replayed bit-for-bit: distinct bench bit positions,
    // all-k-positions-set probe, exact semi-join as the FP audit
    "q_bloom_decontaminate" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |p AS (SELECT doc_id, l, unnest(generate_series(1, len(l) - 2)) AS i FROM tok),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(l[i:i+2], ' ') AS shingle FROM p),
        |bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 100 = 0),
        |corpus AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 100 <> 0),
        |bits AS (SELECT DISTINCT
        |           (('0x' || substr(md5(CAST(r.range AS VARCHAR) || ':' || shingle), 1, 8))::BIGINT
        |             & 2147483647) % 4096 AS bit
        |         FROM bench, range(0, 4) r),
        |probes AS (SELECT doc_id, shingle, r.range AS r,
        |             (('0x' || substr(md5(CAST(r.range AS VARCHAR) || ':' || shingle), 1, 8))::BIGINT
        |               & 2147483647) % 4096 AS bit
        |           FROM corpus, range(0, 4) r),
        |positive AS (SELECT doc_id, shingle FROM probes JOIN bits USING (bit)
        |             GROUP BY doc_id, shingle HAVING COUNT(DISTINCT r) = 4),
        |nb AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bloom FROM positive GROUP BY doc_id),
        |nt AS (SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_true
        |       FROM corpus c JOIN bench b USING (shingle) GROUP BY c.doc_id)
        |SELECT nb.doc_id, nb.n_bloom,
        |       CAST(COALESCE(nt.n_true, 0) AS BIGINT) AS n_true,
        |       CAST(nb.n_bloom - COALESCE(nt.n_true, 0) AS BIGINT) AS n_false_pos
        |FROM nb LEFT JOIN nt USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // HLL replayed register-for-register: same bucket/rank split, the
    // harmonic sum as exact integer 2^(40-M) terms, one shared-text
    // float division at the end
    "q_hll_audit" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |p AS (SELECT doc_id, l, unnest(generate_series(1, len(l) - 2)) AS i FROM tok),
        |sh AS (SELECT DISTINCT array_to_string(l[i:i+2], ' ') AS g FROM p),
        |h AS (SELECT (('0x' || substr(md5(g), 1, 8))::BIGINT & 2147483647) AS hv FROM sh),
        |r AS (SELECT hv % 1024 AS reg, hv // 1024 AS h2 FROM h),
        |rk AS (SELECT reg, MAX(CASE WHEN h2 = 0 THEN 22 ELSE 22 - length(bin(h2)) END) AS mj
        |       FROM r GROUP BY reg),
        |spine AS (SELECT range AS reg FROM range(0, 1024)),
        |fr AS (SELECT spine.reg, COALESCE(rk.mj, 0) AS mj FROM spine LEFT JOIN rk USING (reg)),
        |s AS (SELECT CAST(SUM(1::BIGINT << CAST(40 - mj AS INT)) AS BIGINT) AS s40 FROM fr),
        |ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_exact FROM sh)
        |SELECT CAST(1024 AS BIGINT) AS m, ex.n_exact,
        |  CAST(FLOOR((0.7213 / (1.0 + 1.079 / 1024.0)) * 1048576.0 * 1099511627776.0
        |       / CAST(s.s40 AS DOUBLE)) AS BIGINT) AS hll_est,
        |  CAST(FLOOR(CAST((CAST(FLOOR((0.7213 / (1.0 + 1.079 / 1024.0)) * 1048576.0
        |         * 1099511627776.0 / CAST(s.s40 AS DOUBLE)) AS BIGINT) - ex.n_exact)
        |       * 1000000 AS DOUBLE) / CAST(ex.n_exact AS DOUBLE)) AS BIGINT) AS err_ppm
        |FROM ex, s""".stripMargin,

    // count-min replayed counter-for-counter: same md5 row-salted
    // buckets, same min-over-rows estimate
    "q_heavy_hitters" ->
      """WITH v AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |vc AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_exact FROM v GROUP BY tok),
        |hb AS (SELECT r.range AS r, tok, n_exact,
        |         (('0x' || substr(md5(CAST(r.range AS VARCHAR) || ':' || tok), 1, 8))::BIGINT
        |           & 2147483647) % 1024 AS b
        |       FROM vc, range(0, 4) r),
        |cnt AS (SELECT r, b, CAST(SUM(n_exact) AS BIGINT) AS c FROM hb GROUP BY r, b),
        |est AS (SELECT hb.tok, CAST(MIN(cnt.c) AS BIGINT) AS n_cms
        |        FROM hb JOIN cnt USING (r, b) GROUP BY hb.tok)
        |SELECT vc.tok, vc.n_exact, est.n_cms
        |FROM vc JOIN est USING (tok)
        |ORDER BY n_exact DESC, tok LIMIT 20""".stripMargin,

    "q_bpe_pairs" ->
      """WITH v AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |vc AS (SELECT tok, COUNT(*) AS c FROM v GROUP BY tok),
        |p AS (SELECT tok, c, unnest(generate_series(1, length(tok) - 1)) AS i
        |      FROM vc WHERE length(tok) >= 2),
        |pr AS (SELECT tok, c, tok[i : i+1] AS pair FROM p)
        |SELECT pair, CAST(SUM(c) AS BIGINT) AS n_occ, COUNT(DISTINCT tok) AS n_types
        |FROM pr GROUP BY pair
        |ORDER BY n_occ DESC, pair
        |LIMIT 40""".stripMargin,

    "q_seq_pack" ->
      """WITH s AS (SELECT doc_id,
        |        CAST(len(string_split(text, ' ')) AS BIGINT) AS tok FROM documents
        |        WHERE len(string_split(text, ' ')) > 0),
        |c AS (SELECT doc_id, tok,
        |        CAST(SUM(tok) OVER (ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum FROM s),
        |x AS (SELECT doc_id, tok, cum, cum - tok AS st,
        |        unnest(generate_series((cum - tok) // 512, (cum - 1) // 512)) AS seq_id
        |      FROM c)
        |SELECT seq_id, COUNT(*) AS n_docs,
        |       CAST(SUM(CASE WHEN st // 512 = seq_id AND (cum - 1) // 512 = seq_id
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_full_docs,
        |       CAST(SUM(least(cum, (seq_id + 1) * 512) - greatest(st, seq_id * 512))
        |            AS BIGINT) AS fill_tokens,
        |       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM x GROUP BY seq_id
        |ORDER BY seq_id""".stripMargin,

    "q_source_audit" ->
      """WITH per AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |         CAST(SUM(len(regexp_extract_all(text, '[^ ]+'))) AS BIGINT) AS src_tokens,
        |         COUNT(DISTINCT lang) AS n_langs,
        |         MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
        |  FROM documents GROUP BY source),
        |t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS tot_docs FROM per)
        |SELECT source, n_docs, src_tokens, n_langs, min_chars, max_chars,
        |       CAST(src_tokens AS DOUBLE) / n_docs AS mean_tokens,
        |       n_docs * 1000000 // tot_docs AS share_ppm
        |FROM per CROSS JOIN t
        |ORDER BY source""".stripMargin,

    "q_embed_stats" ->
      """WITH p AS (SELECT embedding, unnest(generate_series(1, len(embedding))) AS i
        |           FROM embeddings),
        |m AS (SELECT CAST(i - 1 AS INT) AS dim,
        |        CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS m
        |      FROM p)
        |SELECT dim, COUNT(*) AS n_vals, CAST(SUM(m) AS BIGINT) AS sum_micro,
        |       CAST(CAST(SUM(m * m) AS DECIMAL(38,0)) AS VARCHAR) AS ssq_micro,
        |       MIN(m) AS min_micro, MAX(m) AS max_micro,
        |       CAST(SUM(m) AS DOUBLE) / CAST(COUNT(*) * 1000000 AS DOUBLE) AS mean
        |FROM m GROUP BY dim
        |ORDER BY dim""".stripMargin,

    // the float score expression text is SHARED with the Spark plan
    // (Retrieval.bm25ScoreSql) — identical parse → identical IEEE op
    // order → byte-stable micro snap
    "q_bm25" ->
      s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |dln AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY 1),
        |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |              CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tt FROM documents),
        |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS f FROM tok
        |       WHERE term IN ('vector', 'stream', 'window', 'merge') GROUP BY 1, 2),
        |dfr AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |sc AS (SELECT tf.doc_id,
        |${operators.Retrieval.bm25ScoreSql} AS s_micro
        |       FROM tf JOIN dfr USING (term) JOIN dln USING (doc_id) CROSS JOIN st)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms_hit,
        |       CAST(SUM(s_micro) AS BIGINT) AS score_micro
        |FROM sc GROUP BY doc_id
        |ORDER BY score_micro DESC, doc_id
        |LIMIT 20""".stripMargin,

    // RRF hybrid fusion: BM25 CTEs (depth-100 truncation) + micro-int
    // cosine-to-query ranker + the two-division fused score. Every
    // float literal divides a DOUBLE-cast operand so DuckDB's decimal
    // literals can't change the arithmetic.
    "q_rrf_fusion" ->
      s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
         |dln AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY 1),
         |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |              CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tt FROM documents),
         |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS f FROM tok
         |       WHERE term IN ('vector', 'stream', 'window', 'merge') GROUP BY 1, 2),
         |dfr AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
         |sc AS (SELECT tf.doc_id,
         |${operators.Retrieval.bm25ScoreSql} AS s_micro
         |       FROM tf JOIN dfr USING (term) JOIN dln USING (doc_id) CROSS JOIN st),
         |bmtop AS (SELECT doc_id, CAST(SUM(s_micro) AS BIGINT) AS score_micro
         |          FROM sc GROUP BY doc_id
         |          ORDER BY score_micro DESC, doc_id LIMIT 100),
         |bm AS (SELECT doc_id, ROW_NUMBER() OVER
         |         (ORDER BY score_micro DESC, doc_id) AS r_bm25 FROM bmtop),
         |qm AS (SELECT vec_id,
         |         list_transform(embedding,
         |           x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS m
         |       FROM embeddings),
         |wn AS (SELECT vec_id, m,
         |         CAST(list_sum(list_transform(m, x -> x * x)) AS BIGINT) AS aa FROM qm),
         |qv AS (SELECT m AS mq, aa AS bb FROM wn WHERE vec_id = 0),
         |cosall AS (SELECT wn.vec_id AS doc_id,
         |        CAST(list_sum(list_transform(generate_series(1, len(wn.m)),
         |          i -> wn.m[i] * qv.mq[i])) AS BIGINT) AS dot,
         |        wn.aa AS aa, qv.bb AS bb
         |      FROM wn, qv WHERE wn.vec_id <> 0),
         |coss AS (SELECT doc_id, ${operators.Dedup.cosPpmSql} AS cos_ppm FROM cosall),
         |costop AS (SELECT doc_id, cos_ppm FROM coss
         |           ORDER BY cos_ppm DESC, doc_id LIMIT 100),
         |cr AS (SELECT doc_id, ROW_NUMBER() OVER
         |         (ORDER BY cos_ppm DESC, doc_id) AS r_cos FROM costop),
         |f AS (SELECT COALESCE(bm.doc_id, cr.doc_id) AS doc_id, r_bm25, r_cos
         |      FROM bm FULL OUTER JOIN cr ON bm.doc_id = cr.doc_id)
         |SELECT doc_id, r_bm25, r_cos,
         |       COALESCE(1.0 / CAST(60 + r_bm25 AS DOUBLE), CAST(0.0 AS DOUBLE)) +
         |       COALESCE(1.0 / CAST(60 + r_cos AS DOUBLE), CAST(0.0 AS DOUBLE)) AS rrf
         |FROM f ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin,

    "q_dsir" ->
      """WITH tok AS (SELECT doc_id, lang, string_split(text, ' ') AS l FROM documents),
        |g AS (SELECT doc_id, lang, array_to_string(l[i:i+1], ' ') AS g
        |      FROM (SELECT doc_id, lang, l,
        |              unnest(generate_series(1, len(l) - 1)) AS i FROM tok)),
        |bk AS (SELECT doc_id, lang,
        |         ('0x' || substr(md5(g), 1, 8))::BIGINT & 255 AS b FROM g),
        |raw AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c_raw FROM bk GROUP BY 1),
        |tgt AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c_tgt FROM bk WHERE lang = 'en' GROUP BY 1),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS tot_raw,
        |          CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS tot_tgt FROM bk),
        |ct AS (SELECT raw.b,
        |         COALESCE(c_tgt, 0) * 1000000 // tot_tgt - c_raw * 1000000 // tot_raw AS dppm
        |       FROM raw LEFT JOIN tgt ON raw.b = tgt.b CROSS JOIN tot),
        |dc AS (SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS c FROM bk GROUP BY 1, 2)
        |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_feats,
        |       CAST(SUM(c * dppm) AS BIGINT) AS score
        |FROM dc JOIN ct USING (b) GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    // the mapPartitions decode stub derives float32 features from
    // md5(text) bytes; both engines snap each float to micro-units
    // BEFORE summing, so the aggregate is an order-free integer sum
    "q_multimodal_feat" ->
      """WITH m AS (SELECT doc_id, md5(text) AS h FROM documents),
        |f AS (SELECT doc_id, h, unnest(generate_series(0, 7)) AS i FROM m),
        |v AS (SELECT doc_id,
        |        CAST(CAST(('0x' || substr(h, (i % 16) * 2 + 1, 2))::INT AS FLOAT)
        |             / CAST(255 AS FLOAT) AS DOUBLE) AS x
        |      FROM f)
        |SELECT doc_id, CAST(16 AS BIGINT) AS n_bytes, CAST(8 AS INT) AS feature_dim,
        |       CAST(SUM(CAST(FLOOR(x * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS feat_sum_micro
        |FROM v GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    // real ImageIO PNG round-trip: the payload is a genuine compressed
    // PNG stream, but PNG is lossless and the source color is the first
    // three md5(text) bytes, so decoded pixel stats replay exactly —
    // channel mean r/255 in pure doubles, ITU-R 601 integer luma bin
    // WARC gate: every column recomputed from documents directly —
    // the md5 equality proves the build → gzip → parse loop recovers
    // the body byte-exactly
    "q_warc_extract" ->
      """WITH h AS (SELECT doc_id,
        |    '<html><head><title>doc ' || CAST(doc_id AS VARCHAR)
        |    || '</title></head><body><p>' || text
        |    || '</p></body></html>' AS html
        |  FROM documents)
        |SELECT doc_id, CAST(200 AS INT) AS http_status,
        |  CAST(strlen(html) AS BIGINT) AS n_body_bytes,
        |  md5(html) AS body_md5,
        |  CAST(length(trim(regexp_replace(regexp_replace(
        |    html, '<[^>]*>', ' ', 'g'), '\s+', ' ', 'g'))) AS BIGINT)
        |    AS n_text_chars
        |FROM h ORDER BY doc_id""".stripMargin,

    "q_webdataset" ->
      """WITH m AS (SELECT doc_id, length(text) AS n_chars,
        |    CAST(('0x' || substr(md5(text), 1, 2)) AS INT) AS r,
        |    CAST(('0x' || substr(md5(text), 1, 2)) AS INT) * 256
        |      + CAST(('0x' || substr(md5(text), 3, 2)) AS INT) AS seed,
        |    (CAST(('0x' || substr(md5(text), 5, 2)) AS INT) * 256
        |      + CAST(('0x' || substr(md5(text), 7, 2)) AS INT)) | 1 AS step
        |  FROM documents),
        |s AS (SELECT doc_id, ((seed + k * step) % 65536) - 32768 AS v
        |      FROM m, generate_series(0, 511) AS t(k)),
        |a AS (SELECT doc_id, MAX(ABS(v)) AS peak_abs, SUM(v * v) AS sum_sq
        |      FROM s GROUP BY doc_id)
        |SELECT m.doc_id, CAST(n_chars AS BIGINT) AS n_chars,
        |  CAST(FLOOR(CAST(r AS DOUBLE) / 255 * 1000000 + 0.5) AS BIGINT) AS mean_r_micro,
        |  CAST(peak_abs AS BIGINT) AS peak_abs,
        |  CAST(sum_sq AS BIGINT) AS sum_sq
        |FROM m JOIN a ON m.doc_id = a.doc_id
        |ORDER BY m.doc_id""".stripMargin,

    "q_audio_features" ->
      """WITH m AS (SELECT doc_id,
        |    CAST(('0x' || substr(md5(text), 1, 2)) AS INT) * 256
        |      + CAST(('0x' || substr(md5(text), 3, 2)) AS INT) AS seed,
        |    (CAST(('0x' || substr(md5(text), 5, 2)) AS INT) * 256
        |      + CAST(('0x' || substr(md5(text), 7, 2)) AS INT)) | 1 AS step
        |  FROM documents),
        |s AS (SELECT doc_id, ((seed + k * step) % 65536) - 32768 AS v
        |      FROM m, generate_series(0, 2047) AS t(k))
        |SELECT doc_id, CAST(1 AS INT) AS decoded,
        |  CAST(COUNT(*) AS BIGINT) AS n_samples,
        |  CAST(8000 AS BIGINT) AS sample_rate,
        |  CAST(MAX(ABS(v)) AS BIGINT) AS peak_abs,
        |  CAST(SUM(v * v) AS BIGINT) AS sum_sq,
        |  CAST(SUM(CASE WHEN v >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
        |FROM s
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    "q_frame_extract" ->
      """WITH m AS (SELECT doc_id,
        |    CAST(('0x' || substr(md5(text), 1, 2)) AS INT) AS r,
        |    CAST(('0x' || substr(md5(text), 3, 2)) AS INT) AS g,
        |    CAST(('0x' || substr(md5(text), 5, 2)) AS INT) AS b
        |  FROM documents),
        |f AS (SELECT doc_id, r, g, b, UNNEST([0, 3, 6]) AS i FROM m)
        |SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
        |  CAST(8 AS BIGINT) AS n_frames,
        |  CAST(doc_id % 16 + 8 AS BIGINT) AS fr_width,
        |  CAST(doc_id % 12 + 6 AS BIGINT) AS fr_height,
        |  CAST(FLOOR(CAST((r + 17 * i) % 256 AS DOUBLE) / 255 * 1000000 + 0.5) AS BIGINT) AS mean_r_micro,
        |  CAST(FLOOR(CAST((g + 29 * i) % 256 AS DOUBLE) / 255 * 1000000 + 0.5) AS BIGINT) AS mean_g_micro,
        |  CAST(FLOOR(CAST((b + 43 * i) % 256 AS DOUBLE) / 255 * 1000000 + 0.5) AS BIGINT) AS mean_b_micro
        |FROM f
        |ORDER BY doc_id, frame_idx""".stripMargin,

    "q_multimodal_resize" ->
      """WITH m AS (SELECT doc_id,
        |    CAST(('0x' || substr(md5(text), 1, 2)) AS INT) AS r,
        |    CAST(('0x' || substr(md5(text), 3, 2)) AS INT) AS g,
        |    CAST(('0x' || substr(md5(text), 5, 2)) AS INT) AS b,
        |    CAST(doc_id % 64 + 16 AS INT) AS w,
        |    CAST(doc_id % 48 + 12 AS INT) AS h
        |  FROM documents),
        |dims AS (SELECT doc_id, r, g, b,
        |    CASE WHEN GREATEST(w, h) <= 20 THEN w
        |         WHEN w >= h THEN 20
        |         ELSE GREATEST(1, CAST(FLOOR(CAST(w AS DOUBLE) * (20.0 / CAST(GREATEST(w, h) AS DOUBLE)) + 0.5) AS INT))
        |    END AS ow,
        |    CASE WHEN GREATEST(w, h) <= 20 THEN h
        |         WHEN w >= h THEN GREATEST(1, CAST(FLOOR(CAST(h AS DOUBLE) * (20.0 / CAST(GREATEST(w, h) AS DOUBLE)) + 0.5) AS INT))
        |         ELSE 20
        |    END AS oh
        |  FROM m)
        |SELECT doc_id, CAST(1 AS INT) AS decoded,
        |  ow AS img_width, oh AS img_height,
        |  CAST(FLOOR(CAST(r AS DOUBLE) / 255 * 1000000 + 0.5) AS BIGINT) AS mean_r_micro,
        |  CAST(FLOOR(CAST(g AS DOUBLE) / 255 * 1000000 + 0.5) AS BIGINT) AS mean_g_micro,
        |  CAST(FLOOR(CAST(b AS DOUBLE) / 255 * 1000000 + 0.5) AS BIGINT) AS mean_b_micro,
        |  CAST(((r * 299 + g * 587 + b * 114) // 1000 * 5) // 256 AS INT) AS luma_mode_bin
        |FROM dims
        |ORDER BY doc_id""".stripMargin,

    "q_multimodal_decode" ->
      """WITH m AS (SELECT doc_id,
        |    CAST(('0x' || substr(md5(text), 1, 2)) AS INT) AS r,
        |    CAST(('0x' || substr(md5(text), 3, 2)) AS INT) AS g,
        |    CAST(('0x' || substr(md5(text), 5, 2)) AS INT) AS b
        |  FROM documents)
        |SELECT doc_id, CAST(1 AS INT) AS decoded,
        |  CAST(doc_id % 64 + 16 AS INT) AS img_width,
        |  CAST(doc_id % 48 + 12 AS INT) AS img_height,
        |  CAST(FLOOR(CAST(r AS DOUBLE) / 255 * 1000000 + 0.5) AS BIGINT) AS mean_r_micro,
        |  CAST(FLOOR(CAST(g AS DOUBLE) / 255 * 1000000 + 0.5) AS BIGINT) AS mean_g_micro,
        |  CAST(FLOOR(CAST(b AS DOUBLE) / 255 * 1000000 + 0.5) AS BIGINT) AS mean_b_micro,
        |  CAST(((r * 299 + g * 587 + b * 114) // 1000 * 5) // 256 AS INT) AS luma_mode_bin
        |FROM m
        |ORDER BY doc_id""".stripMargin,

    "q_gopher_rules" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |m AS (SELECT doc_id,
        |        CAST(len(l) AS BIGINT) AS n_words,
        |        CAST(list_sum(list_transform(l, x -> length(x))) AS BIGINT) AS chars,
        |        CAST(len(list_filter(l, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
        |        CAST(len(list_filter(l,
        |          x -> list_contains(['the','a','of','to','and','in','is','be'], x))) AS BIGINT) AS n_stop
        |      FROM tok)
        |SELECT doc_id, n_words,
        |       chars * 1000000 // n_words AS mean_wlen_micro,
        |       n_alpha * 1000000 // n_words AS alpha_ppm,
        |       n_stop,
        |       CASE WHEN n_words BETWEEN 5 AND 1000
        |              AND chars * 1000000 // n_words BETWEEN 3000000 AND 10000000
        |              AND n_alpha * 1000000 // n_words >= 800000
        |              AND n_stop >= 2
        |            THEN 1 ELSE 0 END AS pass
        |FROM m
        |ORDER BY doc_id""".stripMargin,

    // PQ codebook + encode: md5-seeded partition → exact M-step →
    // nearest centroid by exact integer squared distance
    "q_pq_encode" ->
      s"""$pqOracleCore
         |SELECT vec_id,
         |       string_agg(CAST(c AS VARCHAR), ',' ORDER BY s) AS code,
         |       CAST(SUM(d2) AS BIGINT) AS err_micro2
         |FROM best WHERE rn = 1
         |GROUP BY vec_id
         |ORDER BY vec_id""".stripMargin,

    // ADC search over the same codes: per-query LUT of exact centroid
    // distances, database distance = sum of 8 table lookups
    "q_pq_adc" ->
      s"""$pqOracleCore,
         |codes AS (SELECT vec_id, s, c FROM best WHERE rn = 1),
         |q AS (SELECT vec_id AS query_id, s, sd, m FROM v WHERE vec_id < 10),
         |lut AS (SELECT q.query_id, q.s, cent.c,
         |          CAST(SUM((q.m - cent.cm) * (q.m - cent.cm)) AS BIGINT) AS ld
         |        FROM q JOIN cent ON q.s = cent.s AND q.sd = cent.sd
         |        GROUP BY q.query_id, q.s, cent.c),
         |adc AS (SELECT l.query_id, codes.vec_id,
         |          CAST(SUM(l.ld) AS BIGINT) AS adist
         |        FROM codes JOIN lut l ON codes.s = l.s AND codes.c = l.c
         |        WHERE codes.vec_id <> l.query_id
         |        GROUP BY l.query_id, codes.vec_id),
         |rk AS (SELECT query_id, vec_id, adist,
         |         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |                                 ORDER BY adist, vec_id) AS BIGINT) AS rank
         |       FROM adc)
         |SELECT query_id, rank, vec_id AS neighbor_id, adist
         |FROM rk WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    // micro-snap + FLOOR(double division) shared textually with the
    // Spark plan, so the k-means M-step is byte-stable cross-engine
    // full Lloyd loop: micro-int vectors, integer squared-L2, argmin
    // ties to the smallest centroid id (ROW_NUMBER ↔ array_position
    // first-minimum), floored-mean M-step, empty-cluster carry via
    // LEFT JOIN + COALESCE — two assignment rounds, like the Spark loop
    "q_kmeans" ->
      """WITH mvl AS (SELECT vec_id,
        |         list_transform(embedding,
        |           x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS mv
        |       FROM embeddings),
        |md AS (SELECT vec_id, CAST(i - 1 AS INT) AS dim, mv[i] AS m
        |       FROM (SELECT vec_id, mv, unnest(generate_series(1, len(mv))) AS i FROM mvl)),
        |init AS (SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid
        |         FROM (SELECT vec_id FROM mvl ORDER BY vec_id LIMIT 8)),
        |c0 AS (SELECT init.cid, md.dim, md.m AS c FROM init JOIN md USING (vec_id)),
        |a1 AS (SELECT md.vec_id, c0.cid, SUM((md.m - c0.c) * (md.m - c0.c)) AS dist
        |       FROM md JOIN c0 ON md.dim = c0.dim GROUP BY md.vec_id, c0.cid),
        |b1 AS (SELECT vec_id, cid, dist FROM (
        |         SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
        |                     ORDER BY dist, cid) AS rn FROM a1) WHERE rn = 1),
        |u1 AS (SELECT b1.cid, md.dim,
        |         CAST(FLOOR(CAST(SUM(md.m) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS c
        |       FROM b1 JOIN md USING (vec_id) GROUP BY b1.cid, md.dim),
        |c1 AS (SELECT c0.cid, c0.dim, COALESCE(u1.c, c0.c) AS c
        |       FROM c0 LEFT JOIN u1 ON u1.cid = c0.cid AND u1.dim = c0.dim),
        |a2 AS (SELECT md.vec_id, c1.cid, SUM((md.m - c1.c) * (md.m - c1.c)) AS dist
        |       FROM md JOIN c1 ON md.dim = c1.dim GROUP BY md.vec_id, c1.cid),
        |b2 AS (SELECT vec_id, cid, dist FROM (
        |         SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
        |                     ORDER BY dist, cid) AS rn FROM a2) WHERE rn = 1)
        |SELECT CAST(cid AS BIGINT) AS cluster_id, COUNT(*) AS n,
        |       CAST(SUM(dist) AS BIGINT) AS inertia
        |FROM b2 GROUP BY cid ORDER BY cluster_id""".stripMargin,

    "q_centroid_update" ->
      """WITH p AS (SELECT CAST(label AS BIGINT) AS label, embedding,
        |             unnest(generate_series(1, len(embedding))) AS i
        |           FROM embeddings),
        |m AS (SELECT label, CAST(i - 1 AS INT) AS dim,
        |        CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS m
        |      FROM p)
        |SELECT label, dim, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(FLOOR(CAST(SUM(m) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) AS BIGINT)
        |         AS centroid_micro
        |FROM m GROUP BY label, dim
        |ORDER BY label, dim""".stripMargin,

    // centroid M-step reused dim-for-dim; distances and label means in
    // exact integer arithmetic; within-label rank window
    "q_embed_outliers" ->
      """WITH p AS (SELECT vec_id, CAST(label AS BIGINT) AS label, embedding,
        |             unnest(generate_series(1, len(embedding))) AS i
        |           FROM embeddings),
        |m AS (SELECT vec_id, label, CAST(i - 1 AS INT) AS dim,
        |        CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS m
        |      FROM p),
        |cent AS (SELECT label, dim,
        |           CAST(FLOOR(CAST(SUM(m) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) AS BIGINT)
        |             AS c
        |         FROM m GROUP BY label, dim),
        |d2 AS (SELECT vec_id, m.label,
        |         CAST(SUM((m.m - c.c) * (m.m - c.c)) AS BIGINT) AS d2
        |       FROM m JOIN cent c USING (label, dim) GROUP BY 1, 2),
        |mn AS (SELECT label, CAST(SUM(d2) AS BIGINT) // COUNT(*) AS mean_d2
        |       FROM d2 GROUP BY label),
        |r AS (SELECT d2.label, d2.vec_id, d2.d2, mn.mean_d2,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY d2.label
        |                                ORDER BY d2.d2 DESC, d2.vec_id) AS BIGINT) AS rnk
        |      FROM d2 JOIN mn USING (label))
        |SELECT label, rnk, vec_id, d2, mean_d2 FROM r WHERE rnk <= 3
        |ORDER BY label, rnk""".stripMargin,

    "q_split_assign" ->
      """WITH d AS (SELECT
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |    CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |              % 1000000 < 900000 THEN 'train'
        |         WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |              % 1000000 < 950000 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents),
        |tot AS (SELECT COUNT(*) AS total FROM d)
        |SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
        |       CAST(COUNT(*) * 1000000 // total AS BIGINT) AS share_ppm
        |FROM d, tot GROUP BY split, total
        |ORDER BY split""".stripMargin,

    // the full pipeline: every stage reuses an already-verified oracle
    // fragment — curate's token filter, the md5 minhash pair CTEs over
    // the FILTERED corpus, the recursive-CTE closure, seq_pack's
    // packing arithmetic, split_assign's md5 coin (here on seq_id)
    "q_pipeline_e2e" ->
      s"""WITH RECURSIVE fd AS (
         |  SELECT doc_id, text, CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
         |  FROM documents
         |  WHERE len(string_split(text, ' ')) BETWEEN 20 AND 80),
         |${minhashCoreCtes("fd")},
         |pairs AS (SELECT doc_a AS a, doc_b AS b FROM j WHERE jaccard >= 0.5),
         |sym AS (SELECT a AS src, b AS dst FROM pairs
         |        UNION ALL SELECT b AS src, a AS dst FROM pairs),
         |reach(node, lbl) AS (
         |  SELECT DISTINCT src AS node, src AS lbl FROM sym
         |  UNION
         |  SELECT s.src, r.lbl FROM sym s JOIN reach r ON s.dst = r.node),
         |cc AS (SELECT node, MIN(lbl) AS cluster_id FROM reach GROUP BY node),
         |surv AS (SELECT f.doc_id, f.tok FROM fd f
         |         WHERE f.doc_id NOT IN (SELECT node FROM cc WHERE cluster_id <> node)),
         |c AS (SELECT doc_id, tok,
         |        CAST(SUM(tok) OVER (ORDER BY doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |      FROM surv),
         |x AS (SELECT doc_id, tok, cum, cum - tok AS st,
         |        unnest(generate_series((cum - tok) // 512, (cum - 1) // 512)) AS seq_id
         |      FROM c),
         |p AS (SELECT seq_id, COUNT(*) AS n_docs,
         |        CAST(SUM(CASE WHEN st // 512 = seq_id AND (cum - 1) // 512 = seq_id
         |                      THEN 1 ELSE 0 END) AS BIGINT) AS n_full_docs,
         |        CAST(SUM(least(cum, (seq_id + 1) * 512) - greatest(st, seq_id * 512))
         |             AS BIGINT) AS fill_tokens,
         |        MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
         |      FROM x GROUP BY seq_id)
         |SELECT seq_id, n_docs, n_full_docs, fill_tokens, first_doc, last_doc,
         |       CASE WHEN ('0x' || substr(md5(CAST(seq_id AS VARCHAR)), 1, 8))::BIGINT
         |                 % 1000000 < 900000 THEN 'train'
         |            WHEN ('0x' || substr(md5(CAST(seq_id AS VARCHAR)), 1, 8))::BIGINT
         |                 % 1000000 < 950000 THEN 'val'
         |            ELSE 'test' END AS split
         |FROM p
         |ORDER BY seq_id""".stripMargin,

    "q_vocab_prune" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |p AS (SELECT doc_id, l, unnest(generate_series(1, len(l))) AS i FROM tok),
        |tk AS (SELECT doc_id, i, l[i] AS tok FROM p),
        |df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM tk GROUP BY tok),
        |nd AS (SELECT COUNT(*) AS n_docs FROM documents),
        |keep AS (SELECT tok FROM df, nd
        |         WHERE df >= 2 AND df * 1000000 // n_docs <= 700000),
        |re AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
        |              string_agg(tok, ' ' ORDER BY i) AS text_pruned
        |       FROM tk JOIN keep USING (tok) GROUP BY doc_id)
        |SELECT t.doc_id, COALESCE(re.n_kept, 0) AS n_kept,
        |       CAST(len(t.l) AS BIGINT) - COALESCE(re.n_kept, 0) AS n_dropped,
        |       COALESCE(re.text_pruned, '') AS text_pruned
        |FROM tok t LEFT JOIN re ON t.doc_id = re.doc_id
        |ORDER BY t.doc_id""".stripMargin,

    "q_word_drift" ->
      """WITH tk AS (SELECT doc_id % 2 AS grp,
        |              unnest(string_split(text, ' ')) AS tok FROM documents),
        |c AS (SELECT tok,
        |        CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
        |        CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_b
        |      FROM tk GROUP BY tok),
        |tot AS (SELECT SUM(cnt_a) AS tot_a, SUM(cnt_b) AS tot_b FROM c)
        |SELECT tok, cnt_a, cnt_b,
        |       CAST(cnt_a * 1000000 // tot_a AS BIGINT) AS ppm_a,
        |       CAST(cnt_b * 1000000 // tot_b AS BIGINT) AS ppm_b,
        |       CAST(cnt_a * 1000000 // tot_a - cnt_b * 1000000 // tot_b AS BIGINT) AS drift
        |FROM c, tot
        |ORDER BY abs(cnt_a * 1000000 // tot_a - cnt_b * 1000000 // tot_b) DESC, tok
        |LIMIT 30""".stripMargin,

    "q_cooc_window" ->
      """WITH tok AS (SELECT string_split(text, ' ') AS l FROM documents
        |             WHERE len(string_split(text, ' ')) >= 2),
        |p AS (SELECT l, unnest(generate_series(1, len(l) - 1)) AS i FROM tok),
        |j AS (SELECT l, i, unnest(generate_series(i + 1, least(i + 3, len(l)))) AS jx
        |      FROM p),
        |pr AS (SELECT least(l[i], l[jx]) AS w1, greatest(l[i], l[jx]) AS w2 FROM j)
        |SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_cooc
        |FROM pr GROUP BY w1, w2
        |ORDER BY n_cooc DESC, w1, w2
        |LIMIT 30""".stripMargin,

    // md5-coin parity: DuckDB ('0x'||substr(md5(s),1,8))::BIGINT equals
    // Spark conv(substring(md5(s),1,8),16,10) (same trick as MinHash)
    "q_span_corrupt" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |p AS (SELECT doc_id, l, unnest(generate_series(1, len(l))) AS i FROM tok),
        |m AS (SELECT doc_id, i, l[i] AS tok,
        |        CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
        |               || CAST(i AS VARCHAR)), 1, 8))::BIGINT % 100 < 15
        |             THEN 1 ELSE 0 END AS msk
        |      FROM p),
        |s AS (SELECT doc_id, i, tok, msk,
        |        CASE WHEN msk = 1 AND COALESCE(LAG(msk) OVER
        |               (PARTITION BY doc_id ORDER BY i), 0) = 0
        |             THEN 1 ELSE 0 END AS is_start
        |      FROM m),
        |sp AS (SELECT doc_id, i, tok, msk, is_start,
        |         SUM(is_start) OVER (PARTITION BY doc_id ORDER BY i) AS span_idx
        |       FROM s),
        |o AS (SELECT doc_id, i, msk, is_start,
        |        CASE WHEN msk = 0 THEN tok
        |             WHEN is_start = 1
        |               THEN '<extra_id_' || CAST(span_idx - 1 AS VARCHAR) || '>'
        |             ELSE NULL END AS ot
        |      FROM sp)
        |SELECT doc_id,
        |       string_agg(ot, ' ' ORDER BY i) FILTER (WHERE ot IS NOT NULL) AS corrupted,
        |       CAST(SUM(msk) AS BIGINT) AS n_masked,
        |       CAST(SUM(is_start) AS BIGINT) AS n_spans
        |FROM o GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    "q_domain_cap" ->
      """WITH r AS (SELECT source, doc_id, n_chars,
        |             ROW_NUMBER() OVER (PARTITION BY source
        |                                ORDER BY n_chars DESC, doc_id) AS rnk
        |           FROM documents),
        |t AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |        CAST(SUM(n_chars) AS BIGINT) AS chars_total FROM documents GROUP BY 1),
        |k AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept,
        |        CAST(SUM(n_chars) AS BIGINT) AS chars_kept FROM r WHERE rnk <= 10 GROUP BY 1)
        |SELECT source, n_docs, n_kept, chars_kept,
        |       chars_total - chars_kept AS chars_dropped
        |FROM t JOIN k USING (source)
        |ORDER BY source""".stripMargin,

    // PSL algorithm replayed relationally: every label tail (and its
    // wildcard form) joins the rule dim; exception prevails, else most
    // labels; unmatched hosts fall to the implicit-star default
    "q_domain_parse" ->
      """WITH hosts(h_idx, host) AS (VALUES
        |  (0, 'www.acme.com'), (1, 'blog.widget.co.uk'), (2, 'contoso.org.uk'),
        |  (3, 'fabrikam.github.io'), (4, 'example.ac.jp'), (5, 'shop.example.jp'),
        |  (6, 'foo.bar.ck'), (7, 'www.ck'), (8, 'mail.www.ck'),
        |  (9, 'nonexistent.zz'), (10, 'com'), (11, 'deep.sub.acme.co.uk')),
        |rules(match_key, is_exc, rule_labels) AS (VALUES
        |  ('com', 0, 1), ('org', 0, 1), ('net', 0, 1), ('uk', 0, 1),
        |  ('co.uk', 0, 2), ('org.uk', 0, 2), ('io', 0, 1), ('github.io', 0, 2),
        |  ('jp', 0, 1), ('ac.jp', 0, 2), ('*.ck', 0, 2), ('www.ck', 1, 2),
        |  ('us', 0, 1), ('k12.va.us', 0, 3)),
        |d AS (SELECT doc_id,
        |        ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 12 AS h_idx
        |      FROM documents),
        |dh AS (SELECT doc_id, host, string_split(host, '.') AS labels,
        |              len(string_split(host, '.')) AS n
        |       FROM d JOIN hosts USING (h_idx)),
        |t0 AS (SELECT doc_id, host, labels, n,
        |              CAST(unnest(generate_series(1, n)) AS INT) AS i
        |       FROM dh),
        |tails AS (SELECT doc_id, host, labels, n, i,
        |            array_to_string(labels[i:CAST(n AS INT)], '.') AS tail,
        |            CASE WHEN n - i >= 1
        |              THEN '*.' || array_to_string(labels[i+1:CAST(n AS INT)], '.')
        |            END AS wf
        |          FROM t0),
        |mk AS (SELECT doc_id, i, tail AS match_key FROM tails
        |       UNION ALL
        |       SELECT doc_id, i, wf FROM tails WHERE wf IS NOT NULL),
        |m AS (SELECT mk.doc_id, r.is_exc,
        |             r.rule_labels - r.is_exc AS eff_labels,
        |             mk.i + r.is_exc AS suffix_start
        |      FROM mk JOIN rules r USING (match_key)),
        |best AS (SELECT doc_id, suffix_start FROM
        |         (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
        |                      ORDER BY is_exc DESC, eff_labels DESC,
        |                               suffix_start DESC) AS rn
        |          FROM m)
        |         WHERE rn = 1),
        |res AS (SELECT dh.doc_id, dh.host, dh.labels, dh.n,
        |               CAST(COALESCE(b.suffix_start, dh.n) AS INT) AS ss
        |        FROM dh LEFT JOIN best b USING (doc_id))
        |SELECT doc_id, host,
        |       array_to_string(labels[ss:CAST(n AS INT)], '.') AS public_suffix,
        |       CASE WHEN ss >= 2
        |         THEN array_to_string(labels[ss-1:CAST(n AS INT)], '.')
        |       END AS etld1
        |FROM res
        |ORDER BY doc_id""".stripMargin,

    // order-independent XOR fold of a 60-bit md5 prefix — the
    // commutativity is what makes the signature shard-order-proof
    "q_shard_checksum" ->
      """SELECT doc_id % 8 AS shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(bit_xor(('0x' || substr(md5(text), 1, 15))::BIGINT) AS BIGINT) AS content_sig,
        |       CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM documents
        |GROUP BY shard
        |ORDER BY shard""".stripMargin,

    // Hilbert + Morton curve kernels replayed round-for-round: the
    // xy2d reflect/swap loop as chained CTEs, interleave as bit ops
    "q_hilbert" -> {
      val rounds = graft.functions.ZOrder.hilbertOracleCtes(8, Seq("x0", "y0"))
      val zExpr = graft.functions.ZOrder.mortonOracleExpr("x0", "y0", 8)
      s"""WITH h0 AS (SELECT l_orderkey % 256 AS x0, l_partkey % 256 AS y0,
         |        l_orderkey % 256 AS x, l_partkey % 256 AS y, 0 AS d FROM lineitem),
         |$rounds,
         |fin AS (SELECT x0, y0, d, $zExpr AS z FROM h8),
         |t AS (SELECT (x0 + 16) // 32 AS tile_x, (y0 + 16) // 32 AS tile_y,
         |        d // 1000 AS hf, z // 1000 AS zf FROM fin)
         |SELECT CAST(tile_x AS BIGINT) AS tile_x, CAST(tile_y AS BIGINT) AS tile_y,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(COUNT(DISTINCT hf) AS BIGINT) AS h_files,
         |  CAST(COUNT(DISTINCT zf) AS BIGINT) AS z_files
         |FROM t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },

    // the scalable range-partitioned row-number vs a true global
    // ROW_NUMBER over the same hash order — md5 coin shared verbatim
    "q_epoch_shuffle" ->
      """WITH e(epoch) AS (VALUES (1), (2))
        |SELECT CAST(epoch AS BIGINT) AS epoch, doc_id,
        |       CAST(ROW_NUMBER() OVER (PARTITION BY epoch
        |              ORDER BY md5(epoch || '_' || CAST(doc_id AS VARCHAR)), doc_id)
        |            AS BIGINT) AS pos
        |FROM documents, e
        |ORDER BY epoch, pos""".stripMargin,

    // JSONL round-trip fidelity: the decoded aggregate must equal the
    // parquet source's, plus exactly the one injected corrupt line
    "q_jsonl_ingest" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
        |       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |       CAST(1 AS BIGINT) AS n_corrupt
        |FROM documents""".stripMargin,

    // CCNet-style boilerplate segment dedup: group by raw segment
    // text (the fingerprint optimization is engine-side only), both
    // engines slice 1-based with end-truncation
    "q_line_dedup" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |seg AS (SELECT doc_id,
        |          array_to_string(l[(i*10+1):(i*10+10)], ' ') AS s,
        |          least(CAST(len(l) AS BIGINT) - i*10, 10) AS stok
        |        FROM (SELECT doc_id, l,
        |                unnest(generate_series(0, CAST(ceil(len(l)/10.0) AS BIGINT) - 1)) AS i
        |              FROM tok)),
        |dfc AS (SELECT s, COUNT(DISTINCT doc_id) AS df FROM seg GROUP BY s)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_segs,
        |       CAST(SUM(CASE WHEN df >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
        |       CAST(SUM(CASE WHEN df < 3 THEN stok ELSE 0 END) AS BIGINT) AS kept_tokens,
        |       CAST(SUM(CASE WHEN df >= 3 THEN 1 ELSE 0 END) * 1000000
        |            // COUNT(*) AS BIGINT) AS boiler_ppm
        |FROM seg JOIN dfc USING (s)
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    // full LSH index replay: md5-parity ±1 hyperplanes, integer-exact
    // sign sketches (micro-int vectors, |dot| ≤ 64e6 ≪ 2^53), 6-bit
    // bucket keys per table, exact-bucket candidates, shared cos-ppm
    // verify — every intermediate integer equals the Spark plan's
    "q_dedup_embed" ->
      s"""WITH q AS (SELECT vec_id,
        |    list_transform(embedding,
        |      x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS m
        |  FROM embeddings),
        |w AS (SELECT vec_id, m,
        |        CAST(list_sum(list_transform(m, x -> x * x)) AS BIGINT) AS aa FROM q),
        |pl AS (SELECT t, p,
        |         list_transform(generate_series(1, 64),
        |           d -> CASE WHEN ('0x' || substr(md5(t || '_' || p || '_' || d), 1, 8))::BIGINT
        |                          % 2 = 0 THEN 1 ELSE -1 END) AS s
        |       FROM range(8) tt(t), range(6) pp(p)),
        |bits AS (SELECT w.vec_id, pl.t, pl.p,
        |           CASE WHEN list_sum(list_transform(generate_series(1, len(w.m)),
        |             d -> pl.s[d] * w.m[d])) >= 0 THEN 1 ELSE 0 END AS b
        |         FROM w, pl),
        |bk AS (SELECT vec_id, t, CAST(SUM(b * (1::BIGINT << p)) AS BIGINT) AS bucket
        |       FROM bits GROUP BY vec_id, t),
        |cand AS (SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
        |         FROM bk x JOIN bk y
        |           ON x.t = y.t AND x.bucket = y.bucket AND x.vec_id < y.vec_id),
        |p2 AS (SELECT c.id_a, c.id_b,
        |         CAST(list_sum(list_transform(generate_series(1, len(a.m)),
        |           i -> a.m[i] * b.m[i])) AS BIGINT) AS dot,
        |         a.aa AS aa, b.aa AS bb
        |       FROM cand c JOIN w a ON a.vec_id = c.id_a
        |                   JOIN w b ON b.vec_id = c.id_b),
        |s AS (SELECT id_a, id_b, ${operators.Dedup.cosPpmSql} AS cos_ppm FROM p2)
        |SELECT id_a, id_b, cos_ppm FROM s
        |WHERE cos_ppm >= 300000
        |ORDER BY id_a, id_b""".stripMargin,

    // recall audit: exact all-pairs truth on the md5-coin sample vs
    // the same LSH bucketing q_dedup_embed's oracle replays
    "q_ann_recall" ->
      s"""WITH samp AS (SELECT vec_id, embedding FROM embeddings
        |  WHERE ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT
        |        % 1000000 < 250000),
        |q AS (SELECT vec_id,
        |    list_transform(embedding,
        |      x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS m
        |  FROM samp),
        |w AS (SELECT vec_id, m,
        |        CAST(list_sum(list_transform(m, x -> x * x)) AS BIGINT) AS aa FROM q),
        |p2 AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |         CAST(list_sum(list_transform(generate_series(1, len(a.m)),
        |           i -> a.m[i] * b.m[i])) AS BIGINT) AS dot,
        |         a.aa AS aa, b.aa AS bb
        |       FROM w a JOIN w b ON a.vec_id < b.vec_id),
        |truth AS (SELECT * FROM (
        |            SELECT id_a, id_b, ${operators.Dedup.cosPpmSql} AS cos_ppm FROM p2)
        |          WHERE cos_ppm >= 300000),
        |pl AS (SELECT t, p,
        |         list_transform(generate_series(1, 64),
        |           d -> CASE WHEN ('0x' || substr(md5(t || '_' || p || '_' || d), 1, 8))::BIGINT
        |                          % 2 = 0 THEN 1 ELSE -1 END) AS s
        |       FROM range(8) tt(t), range(6) pp(p)),
        |bits AS (SELECT w.vec_id, pl.t, pl.p,
        |           CASE WHEN list_sum(list_transform(generate_series(1, len(w.m)),
        |             d -> pl.s[d] * w.m[d])) >= 0 THEN 1 ELSE 0 END AS b
        |         FROM w, pl),
        |bk AS (SELECT vec_id, t, CAST(SUM(b * (1::BIGINT << p)) AS BIGINT) AS bucket
        |       FROM bits GROUP BY vec_id, t),
        |cand AS (SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
        |         FROM bk x JOIN bk y
        |           ON x.t = y.t AND x.bucket = y.bucket AND x.vec_id < y.vec_id)
        |SELECT tr.cos_ppm // 100000 AS band,
        |       CAST(COUNT(*) AS BIGINT) AS n_true,
        |       CAST(SUM(CASE WHEN c.id_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_found,
        |       CAST(SUM(CASE WHEN c.id_a IS NOT NULL THEN 1 ELSE 0 END) * 1000000
        |            // COUNT(*) AS BIGINT) AS recall_ppm
        |FROM truth tr LEFT JOIN cand c
        |  ON tr.id_a = c.id_a AND tr.id_b = c.id_b
        |GROUP BY band
        |ORDER BY band""".stripMargin,

    // cos-ppm snap text shared with the Spark plan (Dedup.cosPpmSql)
    "q_dedup_embed_exact" ->
      s"""$embedExactOracleCore
        |SELECT id_a, id_b, cos_ppm FROM s
        |WHERE cos_ppm >= 300000
        |ORDER BY id_a, id_b""".stripMargin,

    "q_semdedup" ->
      s"""${embedExactOracleCore.replaceFirst("WITH ", "WITH RECURSIVE ")},
        |pairs AS (SELECT id_a AS a, id_b AS b FROM s WHERE cos_ppm >= 300000),
        |sym AS (SELECT a AS src, b AS dst FROM pairs
        |        UNION ALL SELECT b AS src, a AS dst FROM pairs),
        |reach(node, lbl) AS (
        |  SELECT DISTINCT src AS node, src AS lbl FROM sym
        |  UNION
        |  SELECT sy.src, r.lbl FROM sym sy JOIN reach r ON sy.dst = r.node),
        |cc AS (SELECT node, MIN(lbl) AS cluster_id FROM reach GROUP BY node)
        |SELECT node AS vec_id, cluster_id,
        |       COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
        |       CASE WHEN node = cluster_id THEN 1 ELSE 0 END AS keep
        |FROM cc
        |ORDER BY vec_id""".stripMargin,

    "q_mixture_weights" ->
      """WITH per AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |         CAST(SUM(len(regexp_extract_all(text, '[^ ]+'))) AS BIGINT) AS src_tokens
        |  FROM documents GROUP BY source),
        |t AS (SELECT CAST(SUM(src_tokens) AS BIGINT) AS total_tokens,
        |             COUNT(*) AS n_sources FROM per)
        |SELECT source, n_docs, src_tokens,
        |       total_tokens // n_sources AS target_tokens,
        |       least(4000000, (total_tokens // n_sources) * 1000000 // src_tokens) AS weight_ppm,
        |       src_tokens * least(4000000, (total_tokens // n_sources) * 1000000 // src_tokens)
        |         // 1000000 AS sampled_tokens
        |FROM per CROSS JOIN t
        |ORDER BY source""".stripMargin,

    "q_partial_reagg" ->
      """SELECT event_type, COUNT(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(9,2))) AS DOUBLE) AS total,
        |       MIN(value) AS mn, MAX(value) AS mx,
        |       CAST(SUM(CAST(value AS DECIMAL(9,2))) AS DOUBLE) / COUNT(*) AS avg_value,
        |       COUNT(DISTINCT CAST(ts AS DATE)) AS n_days
        |FROM events GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q_quantize" ->
      """WITH v AS (SELECT vec_id,
        |        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |m AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS mx FROM v),
        |s AS (SELECT vec_id, v,
        |        CASE WHEN mx = 0 THEN 0.0 ELSE 127.0 / mx END AS scale FROM m),
        |q AS (SELECT vec_id, scale,
        |        list_transform(v, x -> floor(x * scale + 0.5)) AS qv FROM s)
        |SELECT vec_id, CAST(len(qv) AS BIGINT) AS n_dims, scale,
        |       CAST(list_sum(qv) AS BIGINT) AS checksum,
        |       CAST(len(list_filter(qv, x -> abs(x) >= 127.0)) AS BIGINT) AS n_sat
        |FROM q ORDER BY vec_id""".stripMargin,

    "q_scd2" ->
      """SELECT user_id, event_id, ts AS valid_from, event_type AS state,
        |       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
        |       CAST(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |            AS BIGINT) AS is_current
        |FROM events
        |WHERE user_id < 100
        |ORDER BY user_id, valid_from, event_id""".stripMargin,

    "q_salted_join" ->
      """SELECT c_nationkey, COUNT(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(9,2))) AS DOUBLE) AS total_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin,

    "q_spatial_join" ->
      """WITH pts AS (
        |  SELECT event_id, value AS x, CAST(user_id % 128 AS DOUBLE) AS y
        |  FROM events),
        |rects AS (
        |  SELECT c_custkey,
        |         CAST(c_custkey % 97 AS DOUBLE) AS x0,
        |         CAST(c_custkey % 53 AS DOUBLE) AS y0,
        |         CAST(c_custkey % 97 AS DOUBLE) + 2.0
        |           + CAST(c_nationkey % 5 AS DOUBLE) AS x1,
        |         CAST(c_custkey % 53 AS DOUBLE) + 3.0 AS y1
        |  FROM customer)
        |SELECT c_custkey, COUNT(*) AS n_points
        |FROM rects JOIN pts
        |  ON x BETWEEN x0 AND x1 AND y BETWEEN y0 AND y1
        |GROUP BY c_custkey
        |ORDER BY c_custkey""".stripMargin,

    "q_fuzzy_match" ->
      """WITH sm AS (SELECT p_partkey, p_name FROM part WHERE p_size <= 5),
        |pairs AS (
        |  SELECT a.p_partkey AS pk, b.p_partkey AS other
        |  FROM sm a JOIN sm b
        |    ON split_part(a.p_name, ' ', 1) = split_part(b.p_name, ' ', 1)
        |   AND a.p_partkey <> b.p_partkey
        |   AND a.p_name <> b.p_name
        |   AND abs(len(a.p_name) - len(b.p_name)) <= 3
        |   AND levenshtein(a.p_name, b.p_name) <= 3)
        |SELECT pk AS p_partkey, COUNT(*) AS n_matches, MIN(other) AS best_match
        |FROM pairs GROUP BY 1
        |ORDER BY 1""".stripMargin,

    "q_hierarchy" ->
      """WITH RECURSIVE t AS (
        |  SELECT c_custkey AS node, c_custkey // 10 AS parent FROM customer),
        |walk(node, cur, depth, path) AS (
        |  SELECT node, node, 0, CAST(node AS VARCHAR) FROM t
        |  UNION ALL
        |  SELECT w.node, t2.parent, w.depth + 1,
        |         CAST(t2.parent AS VARCHAR) || '/' || w.path
        |  FROM walk w JOIN t t2 ON w.cur = t2.node
        |  WHERE t2.parent <> t2.node)
        |SELECT node, CAST(split_part(path, '/', 1) AS BIGINT) AS root,
        |       CAST(depth AS BIGINT) AS depth, path
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY node
        |                                   ORDER BY depth DESC) AS rn FROM walk)
        |WHERE rn = 1
        |ORDER BY node""".stripMargin,

    "q_ratio_report" ->
      """SELECT event_id, CAST(ts AS DATE) AS d, value,
        |       value / CAST(SUM(CAST(value AS DECIMAL(9,2)))
        |                    OVER (PARTITION BY CAST(ts AS DATE)) AS DOUBLE) AS share
        |FROM events
        |QUALIFY event_id % 100 = 0
        |ORDER BY event_id""".stripMargin,

    "q_dedup_best" ->
      """SELECT doc_id, n_chars, CAST(n_copies AS BIGINT) AS n_copies
        |FROM (SELECT doc_id, n_chars,
        |             ROW_NUMBER() OVER (PARTITION BY md5(text)
        |                                ORDER BY n_chars DESC, doc_id) AS rn,
        |             COUNT(*) OVER (PARTITION BY md5(text)) AS n_copies
        |      FROM documents)
        |WHERE rn = 1
        |ORDER BY doc_id""".stripMargin,

    "q_not_in_null" -> graft.operators.Relational.NotInNullSql,

    // —— remaining TPC-H suite shapes ——
    "q7_volume" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |       CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
        |       CAST($SumDisc AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
        |  AND ((n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_11') OR
        |       (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_9'))
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3""".stripMargin,

    "q8_share" ->
      """SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
        |       CAST(SUM(CASE WHEN n2.n_name = 'NATION_9'
        |                     THEN CAST(l_extendedprice AS DECIMAL(9,2))
        |                          * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
        |                     ELSE CAST(0 AS DECIMAL(9,2)) END) AS DOUBLE)
        |       / CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2))
        |                  * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
        |       AS mkt_share
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey AND p_type = 'ECONOMY'
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    "q9_profit" ->
      s"""SELECT n_name AS nation,
        |       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
        |       CAST($SumDisc AS DOUBLE)
        |       - CAST(SUM(CAST(p_retailprice AS DECIMAL(9,2))
        |                  * CAST(l_quantity AS DECIMAL(9,2))
        |                  * CAST(0.8 AS DECIMAL(4,2))) AS DOUBLE) AS sum_profit
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey AND p_name LIKE '%red%'
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON o_orderkey = l_orderkey
        |GROUP BY 1, 2
        |ORDER BY 1 ASC, 2 DESC""".stripMargin,

    "q10_returns" ->
      s"""SELECT c_custkey, c_name, CAST($SumDisc AS DOUBLE) AS revenue,
        |       c_acctbal, n_name
        |FROM lineitem
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate <  TIMESTAMP '1996-04-01'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,

    "q13_custdist" ->
      """SELECT c_count, COUNT(*) AS custdist
        |FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |      FROM customer
        |      LEFT JOIN orders ON c_custkey = o_custkey
        |                      AND o_orderpriority <> '1-URGENT'
        |      GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q15_topsupp" ->
      s"""WITH rev AS (
        |  SELECT l_suppkey, CAST($SumDisc AS DOUBLE) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate <  TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier JOIN rev ON s_suppkey = l_suppkey
        |WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "q17_smallqty" ->
      """WITH lines AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE p_brand = 'Brand#3'),
        |avgq AS (
        |  SELECT l_partkey AS ap,
        |         CAST(SUM(CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE) / COUNT(*) AS avg_qty
        |  FROM lines GROUP BY 1)
        |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE) / 7.0 AS avg_yearly,
        |       COUNT(*) AS n_lines
        |FROM lines JOIN avgq ON l_partkey = ap
        |WHERE l_quantity < 0.2 * avg_qty""".stripMargin,

    "q18_bigorder" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |         CAST(SUM(CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE) > 250.0)
        |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
        |FROM orders
        |JOIN big ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin,

    "q19_disc" ->
      s"""SELECT CAST($SumDisc AS DOUBLE) AS revenue, COUNT(*) AS n_lines
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 25
        |       AND l_quantity BETWEEN 10 AND 30)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 35
        |       AND l_quantity BETWEEN 20 AND 40)""".stripMargin,

    "q22_idle" ->
      """SELECT c_custkey % 7 AS cohort, COUNT(*) AS numcust,
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(9,2))) AS DOUBLE) AS totacctbal
        |FROM customer
        |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(9,2))) AS DOUBLE) / COUNT(*)
        |                   FROM customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '2001-01-01')
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    "q_knn_ivf" ->
      """WITH p AS (SELECT vec_id, embedding AS e,
        |                  unnest(generate_series(1, len(embedding))) AS i
        |           FROM embeddings),
        |v AS (SELECT vec_id, CAST(i - 1 AS BIGINT) AS dim,
        |             CAST(FLOOR(CAST(e[i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS m
        |      FROM p),
        |c0 AS (SELECT vec_id AS b, dim, m AS cm FROM v WHERE vec_id < 16),
        |a0 AS (SELECT vec_id, b FROM
        |       (SELECT d0.vec_id, d0.b,
        |               ROW_NUMBER() OVER (PARTITION BY d0.vec_id
        |                                  ORDER BY d0.d2, d0.b) AS rn
        |        FROM (SELECT v.vec_id, c0.b,
        |                     CAST(SUM((v.m - c0.cm) * (v.m - c0.cm)) AS BIGINT) AS d2
        |              FROM v JOIN c0 USING (dim) GROUP BY 1, 2) d0)
        |       WHERE rn = 1),
        |mm AS (SELECT a0.b, v.dim,
        |              CAST(FLOOR(CAST(SUM(v.m) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
        |                   AS BIGINT) AS cmm
        |       FROM v JOIN a0 USING (vec_id) GROUP BY 1, 2),
        |cent AS (SELECT c0.b, c0.dim, COALESCE(mm.cmm, c0.cm) AS cm
        |         FROM c0 LEFT JOIN mm ON mm.b = c0.b AND mm.dim = c0.dim),
        |dist AS (SELECT vec_id, b, CAST(SUM((m - cm) * (m - cm)) AS BIGINT) AS d2
        |         FROM v JOIN cent USING (dim) GROUP BY 1, 2),
        |assign AS (SELECT vec_id AS neighbor_id, b FROM
        |           (SELECT vec_id, b,
        |                   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, b) AS rn
        |            FROM dist)
        |           WHERE rn = 1),
        |probes AS (SELECT vec_id AS query_id, b FROM
        |           (SELECT vec_id, b,
        |                   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, b) AS rn
        |            FROM dist WHERE vec_id < 10)
        |           WHERE rn <= 6),
        |cand AS (SELECT query_id, neighbor_id FROM probes JOIN assign USING (b)
        |         WHERE neighbor_id <> query_id),
        |pd AS (SELECT c.query_id, c.neighbor_id,
        |              CAST(SUM((vq.m - vn.m) * (vq.m - vn.m)) AS BIGINT) AS d2
        |       FROM cand c
        |       JOIN v vq ON vq.vec_id = c.query_id
        |       JOIN v vn ON vn.vec_id = c.neighbor_id AND vn.dim = vq.dim
        |       GROUP BY 1, 2)
        |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, d2
        |FROM (SELECT query_id, neighbor_id, d2,
        |             ROW_NUMBER() OVER (PARTITION BY query_id
        |                                ORDER BY d2, neighbor_id) AS rank
        |      FROM pd)
        |WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    // the flat-IVF oracle with the label PRE-FILTER on the candidate
    // join: each query's top-k restricted to its own label class
    "q_knn_filtered" ->
      """WITH p AS (SELECT vec_id, embedding AS e,
        |                  unnest(generate_series(1, len(embedding))) AS i
        |           FROM embeddings),
        |v AS (SELECT vec_id, CAST(i - 1 AS BIGINT) AS dim,
        |             CAST(FLOOR(CAST(e[i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS m
        |      FROM p),
        |lbl AS (SELECT vec_id, CAST(label AS BIGINT) AS lbl FROM embeddings),
        |c0 AS (SELECT vec_id AS b, dim, m AS cm FROM v WHERE vec_id < 16),
        |a0 AS (SELECT vec_id, b FROM
        |       (SELECT d0.vec_id, d0.b,
        |               ROW_NUMBER() OVER (PARTITION BY d0.vec_id
        |                                  ORDER BY d0.d2, d0.b) AS rn
        |        FROM (SELECT v.vec_id, c0.b,
        |                     CAST(SUM((v.m - c0.cm) * (v.m - c0.cm)) AS BIGINT) AS d2
        |              FROM v JOIN c0 USING (dim) GROUP BY 1, 2) d0)
        |       WHERE rn = 1),
        |mm AS (SELECT a0.b, v.dim,
        |              CAST(FLOOR(CAST(SUM(v.m) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
        |                   AS BIGINT) AS cmm
        |       FROM v JOIN a0 USING (vec_id) GROUP BY 1, 2),
        |cent AS (SELECT c0.b, c0.dim, COALESCE(mm.cmm, c0.cm) AS cm
        |         FROM c0 LEFT JOIN mm ON mm.b = c0.b AND mm.dim = c0.dim),
        |dist AS (SELECT vec_id, b, CAST(SUM((m - cm) * (m - cm)) AS BIGINT) AS d2
        |         FROM v JOIN cent USING (dim) GROUP BY 1, 2),
        |assign AS (SELECT vec_id AS neighbor_id, b FROM
        |           (SELECT vec_id, b,
        |                   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, b) AS rn
        |            FROM dist)
        |           WHERE rn = 1),
        |probes AS (SELECT vec_id AS query_id, b FROM
        |           (SELECT vec_id, b,
        |                   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, b) AS rn
        |            FROM dist WHERE vec_id < 10)
        |           WHERE rn <= 6),
        |cand AS (SELECT query_id, neighbor_id, lq.lbl AS lbl
        |         FROM probes JOIN assign USING (b)
        |         JOIN lbl lq ON lq.vec_id = query_id
        |         JOIN lbl ln ON ln.vec_id = neighbor_id
        |         WHERE neighbor_id <> query_id AND lq.lbl = ln.lbl),
        |pd AS (SELECT c.query_id, c.lbl, c.neighbor_id,
        |              CAST(SUM((vq.m - vn.m) * (vq.m - vn.m)) AS BIGINT) AS d2
        |       FROM cand c
        |       JOIN v vq ON vq.vec_id = c.query_id
        |       JOIN v vn ON vn.vec_id = c.neighbor_id AND vn.dim = vq.dim
        |       GROUP BY 1, 2, 3)
        |SELECT query_id, lbl, CAST(rank AS BIGINT) AS rank, neighbor_id, d2
        |FROM (SELECT query_id, lbl, neighbor_id, d2,
        |             ROW_NUMBER() OVER (PARTITION BY query_id
        |                                ORDER BY d2, neighbor_id) AS rank
        |      FROM pd)
        |WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    // graph ANN, the WHOLE structure replayed — generated in lockstep
    // with GraphAnn.knnGraphExact's loop parameters (see graphAnnOracle)
    "q_knn_graph" -> graphAnnOracle(),

    // two-level exact build: level-1 replays q_knn_ivf's Forgy+Lloyd
    // at nsup=4, level-2 Forgy-seeds each super's first-4 members and
    // runs one FLOOR-mean Lloyd round scoped to the super; probes pick
    // 3 supers then 6 child cells, exact bigint distances throughout
    "q_knn_ivf_2lx" ->
      """WITH p AS (SELECT vec_id, embedding AS e,
        |                  unnest(generate_series(1, len(embedding))) AS i
        |           FROM embeddings),
        |v AS (SELECT vec_id, CAST(i - 1 AS BIGINT) AS dim,
        |             CAST(FLOOR(CAST(e[i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS m
        |      FROM p),
        |c0 AS (SELECT vec_id AS b, dim, m AS cm FROM v WHERE vec_id < 4),
        |a0 AS (SELECT vec_id, b FROM
        |       (SELECT d0.vec_id, d0.b,
        |               ROW_NUMBER() OVER (PARTITION BY d0.vec_id
        |                                  ORDER BY d0.d2, d0.b) AS rn
        |        FROM (SELECT v.vec_id, c0.b,
        |                     CAST(SUM((v.m - c0.cm) * (v.m - c0.cm)) AS BIGINT) AS d2
        |              FROM v JOIN c0 USING (dim) GROUP BY 1, 2) d0)
        |       WHERE rn = 1),
        |mm0 AS (SELECT a0.b, v.dim,
        |               CAST(FLOOR(CAST(SUM(v.m) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
        |                    AS BIGINT) AS cmm
        |        FROM v JOIN a0 USING (vec_id) GROUP BY 1, 2),
        |scent AS (SELECT c0.b AS sup, c0.dim, COALESCE(mm0.cmm, c0.cm) AS cm
        |          FROM c0 LEFT JOIN mm0 ON mm0.b = c0.b AND mm0.dim = c0.dim),
        |sdist AS (SELECT vec_id, sup, CAST(SUM((m - cm) * (m - cm)) AS BIGINT) AS d2
        |          FROM v JOIN scent USING (dim) GROUP BY 1, 2),
        |a1 AS (SELECT vec_id, sup FROM
        |       (SELECT vec_id, sup,
        |               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, sup) AS rn
        |        FROM sdist) WHERE rn = 1),
        |seeds AS (SELECT sup, CAST(rn - 1 AS INT) AS child, vec_id AS seed_vid FROM
        |          (SELECT sup, vec_id,
        |                  ROW_NUMBER() OVER (PARTITION BY sup ORDER BY vec_id) AS rn
        |           FROM a1) WHERE rn <= 4),
        |seedvec AS (SELECT s.sup, s.child, v.dim, v.m AS cm
        |            FROM seeds s JOIN v ON v.vec_id = s.seed_vid),
        |a2 AS (SELECT vec_id, child FROM
        |       (SELECT dd.vec_id, dd.child,
        |               ROW_NUMBER() OVER (PARTITION BY dd.vec_id
        |                                  ORDER BY dd.d2, dd.child) AS rn
        |        FROM (SELECT a1.vec_id, sv.child,
        |                     CAST(SUM((v.m - sv.cm) * (v.m - sv.cm)) AS BIGINT) AS d2
        |              FROM a1 JOIN v USING (vec_id)
        |              JOIN seedvec sv ON sv.sup = a1.sup AND sv.dim = v.dim
        |              GROUP BY 1, 2) dd) WHERE rn = 1),
        |mm2 AS (SELECT a1.sup, a2.child, v.dim,
        |               CAST(FLOOR(CAST(SUM(v.m) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
        |                    AS BIGINT) AS cmm
        |        FROM v JOIN a2 USING (vec_id) JOIN a1 USING (vec_id)
        |        GROUP BY 1, 2, 3),
        |cells AS (SELECT sv.sup, sv.child, sv.dim, COALESCE(mm2.cmm, sv.cm) AS cm
        |          FROM seedvec sv LEFT JOIN mm2
        |            ON mm2.sup = sv.sup AND mm2.child = sv.child AND mm2.dim = sv.dim),
        |cdist AS (SELECT a1.vec_id, a1.sup, c.child,
        |                 CAST(SUM((v.m - c.cm) * (v.m - c.cm)) AS BIGINT) AS d2
        |          FROM a1 JOIN v USING (vec_id)
        |          JOIN cells c ON c.sup = a1.sup AND c.dim = v.dim
        |          GROUP BY 1, 2, 3),
        |assign AS (SELECT vec_id AS neighbor_id, sup, child FROM
        |           (SELECT vec_id, sup, child,
        |                   ROW_NUMBER() OVER (PARTITION BY vec_id
        |                                      ORDER BY d2, child) AS rn
        |            FROM cdist) WHERE rn = 1),
        |sprobes AS (SELECT vec_id AS query_id, sup FROM
        |            (SELECT vec_id, sup,
        |                    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, sup) AS rn
        |             FROM sdist WHERE vec_id < 10) WHERE rn <= 3),
        |cprobes AS (SELECT query_id, sup, child FROM
        |            (SELECT pq.query_id, pq.sup, pq.child,
        |                    ROW_NUMBER() OVER (PARTITION BY pq.query_id
        |                                       ORDER BY pq.d2, pq.sup, pq.child) AS rn
        |             FROM (SELECT sp.query_id, sp.sup, c.child,
        |                          CAST(SUM((vq.m - c.cm) * (vq.m - c.cm)) AS BIGINT) AS d2
        |                   FROM sprobes sp
        |                   JOIN v vq ON vq.vec_id = sp.query_id
        |                   JOIN cells c ON c.sup = sp.sup AND c.dim = vq.dim
        |                   GROUP BY 1, 2, 3) pq) WHERE rn <= 6),
        |cand AS (SELECT query_id, neighbor_id
        |         FROM cprobes JOIN assign USING (sup, child)
        |         WHERE neighbor_id <> query_id),
        |pd AS (SELECT c.query_id, c.neighbor_id,
        |              CAST(SUM((vq.m - vn.m) * (vq.m - vn.m)) AS BIGINT) AS d2
        |       FROM cand c
        |       JOIN v vq ON vq.vec_id = c.query_id
        |       JOIN v vn ON vn.vec_id = c.neighbor_id AND vn.dim = vq.dim
        |       GROUP BY 1, 2)
        |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, d2
        |FROM (SELECT query_id, neighbor_id, d2,
        |             ROW_NUMBER() OVER (PARTITION BY query_id
        |                                ORDER BY d2, neighbor_id) AS rank
        |      FROM pd)
        |WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    // IVFADC: q_knn_ivf's coarse codebook + a Forgy-init/one-Lloyd-round
    // codebook trained on RESIDUALS, ADC search via per-(query, probed
    // bucket) lookup tables — every distance an exact bigint sum
    "q_knn_ivfpq" ->
      """WITH p AS (SELECT vec_id, embedding AS e,
        |                  unnest(generate_series(1, len(embedding))) AS i
        |           FROM embeddings),
        |v AS (SELECT vec_id, CAST(i - 1 AS BIGINT) AS dim,
        |             CAST(FLOOR(CAST(e[i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS m
        |      FROM p),
        |c0 AS (SELECT vec_id AS b, dim, m AS cm FROM v WHERE vec_id < 16),
        |a0 AS (SELECT vec_id, b FROM
        |       (SELECT d0.vec_id, d0.b,
        |               ROW_NUMBER() OVER (PARTITION BY d0.vec_id
        |                                  ORDER BY d0.d2, d0.b) AS rn
        |        FROM (SELECT v.vec_id, c0.b,
        |                     CAST(SUM((v.m - c0.cm) * (v.m - c0.cm)) AS BIGINT) AS d2
        |              FROM v JOIN c0 USING (dim) GROUP BY 1, 2) d0)
        |       WHERE rn = 1),
        |mm AS (SELECT a0.b, v.dim,
        |              CAST(FLOOR(CAST(SUM(v.m) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
        |                   AS BIGINT) AS cmm
        |       FROM v JOIN a0 USING (vec_id) GROUP BY 1, 2),
        |cent AS (SELECT c0.b, c0.dim, COALESCE(mm.cmm, c0.cm) AS cm
        |         FROM c0 LEFT JOIN mm ON mm.b = c0.b AND mm.dim = c0.dim),
        |dist AS (SELECT vec_id, b, CAST(SUM((m - cm) * (m - cm)) AS BIGINT) AS d2
        |         FROM v JOIN cent USING (dim) GROUP BY 1, 2),
        |assign AS (SELECT vec_id, b FROM
        |           (SELECT vec_id, b,
        |                   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, b) AS rn
        |            FROM dist)
        |           WHERE rn = 1),
        |resid AS (SELECT v.vec_id, a.b,
        |                 CAST(v.dim // 2 AS BIGINT) AS s,
        |                 CAST(v.dim % 2 AS BIGINT) AS sd,
        |                 v.m - cent.cm AS r
        |          FROM v JOIN assign a USING (vec_id)
        |          JOIN cent ON cent.b = a.b AND cent.dim = v.dim),
        |rcent0 AS (SELECT s, CAST(vec_id AS BIGINT) AS c, sd, r AS rc
        |           FROM resid WHERE vec_id < 16),
        |a1 AS (SELECT vec_id, s, c FROM
        |       (SELECT d1.vec_id, d1.s, d1.c,
        |               ROW_NUMBER() OVER (PARTITION BY d1.vec_id, d1.s
        |                                  ORDER BY d1.rd2, d1.c) AS rn
        |        FROM (SELECT resid.vec_id, resid.s, r0.c,
        |                     CAST(SUM((resid.r - r0.rc) * (resid.r - r0.rc)) AS BIGINT) AS rd2
        |              FROM resid JOIN rcent0 r0
        |                ON resid.s = r0.s AND resid.sd = r0.sd
        |              GROUP BY 1, 2, 3) d1)
        |       WHERE rn = 1),
        |m1 AS (SELECT a1.s, a1.c, resid.sd,
        |              CAST(FLOOR(CAST(SUM(resid.r) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
        |                   AS BIGINT) AS rc
        |       FROM resid JOIN a1 ON resid.vec_id = a1.vec_id AND resid.s = a1.s
        |       GROUP BY 1, 2, 3),
        |rcent AS (SELECT r0.s, r0.c, r0.sd, COALESCE(m1.rc, r0.rc) AS rc
        |          FROM rcent0 r0 LEFT JOIN m1
        |            ON m1.s = r0.s AND m1.c = r0.c AND m1.sd = r0.sd),
        |rd AS (SELECT resid.vec_id, resid.s, rcent.c,
        |              CAST(SUM((resid.r - rcent.rc) * (resid.r - rcent.rc)) AS BIGINT) AS rd2
        |       FROM resid JOIN rcent ON resid.s = rcent.s AND resid.sd = rcent.sd
        |       GROUP BY 1, 2, 3),
        |codes AS (SELECT vec_id AS neighbor_id, s, c FROM
        |          (SELECT vec_id, s, c,
        |                  ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY rd2, c) AS rn
        |           FROM rd)
        |          WHERE rn = 1),
        |probes AS (SELECT vec_id AS query_id, b FROM
        |           (SELECT vec_id, b,
        |                   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, b) AS rn
        |            FROM dist WHERE vec_id < 10)
        |           WHERE rn <= 6),
        |qresid AS (SELECT pr.query_id, pr.b,
        |                  CAST(v.dim // 2 AS BIGINT) AS s,
        |                  CAST(v.dim % 2 AS BIGINT) AS sd,
        |                  v.m - cent.cm AS qr
        |           FROM probes pr
        |           JOIN v ON v.vec_id = pr.query_id
        |           JOIN cent ON cent.b = pr.b AND cent.dim = v.dim),
        |lut AS (SELECT q.query_id, q.b, q.s, rcent.c,
        |               CAST(SUM((q.qr - rcent.rc) * (q.qr - rcent.rc)) AS BIGINT) AS ld
        |        FROM qresid q JOIN rcent ON q.s = rcent.s AND q.sd = rcent.sd
        |        GROUP BY 1, 2, 3, 4),
        |adc AS (SELECT l.query_id, cb.neighbor_id, CAST(SUM(l.ld) AS BIGINT) AS adist
        |        FROM codes cb
        |        JOIN assign a ON a.vec_id = cb.neighbor_id
        |        JOIN lut l ON l.b = a.b AND l.s = cb.s AND l.c = cb.c
        |        WHERE cb.neighbor_id <> l.query_id
        |        GROUP BY 1, 2)
        |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, adist
        |FROM (SELECT query_id, neighbor_id, adist,
        |             ROW_NUMBER() OVER (PARTITION BY query_id
        |                                ORDER BY adist, neighbor_id) AS rank
        |      FROM adc)
        |WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    "q2_mincost" ->
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS supplycost
        |  FROM lineitem GROUP BY 1, 2),
        |rps AS (
        |  SELECT p_partkey, s_acctbal, s_name, n_name, supplycost
        |  FROM ps
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation ON n_nationkey = s_nationkey
        |  JOIN region ON r_regionkey = n_regionkey AND r_name = 'EUROPE'
        |  JOIN part ON p_partkey = l_partkey
        |            AND p_type = 'STANDARD' AND p_size <= 15),
        |minc AS (
        |  SELECT p_partkey AS mp, MIN(supplycost) AS min_cost
        |  FROM rps GROUP BY 1)
        |SELECT s_acctbal, s_name, n_name, p_partkey,
        |       CAST(supplycost AS DOUBLE) AS supplycost
        |FROM rps JOIN minc ON p_partkey = mp AND supplycost = min_cost
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,

    "q11_important" ->
      """WITH pv AS (
        |  SELECT l_partkey,
        |         SUM(CAST(l_extendedprice AS DECIMAL(9,2)) *
        |             CAST(l_quantity AS DECIMAL(9,2))) AS value_dec
        |  FROM lineitem
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation ON n_nationkey = s_nationkey AND n_name = 'NATION_7'
        |  GROUP BY 1)
        |SELECT l_partkey AS p_partkey, CAST(value_dec AS DOUBLE) AS value
        |FROM pv
        |WHERE CAST(value_dec AS DOUBLE) >
        |      (SELECT CAST(SUM(value_dec) AS DOUBLE) FROM pv) * 0.001
        |ORDER BY value DESC, p_partkey""".stripMargin,

    "q16_partsupp" ->
      """SELECT p_brand, p_type, p_size,
        |       COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        |JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'PROMO%'
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                        WHERE s_name LIKE '%7')
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q20_potential" ->
      """WITH pairs AS (
        |  SELECT l_partkey, l_suppkey,
        |         SUM(CASE WHEN l_returnflag = 'A'
        |             THEN CAST(l_quantity AS DECIMAL(9,2))
        |             ELSE CAST(0 AS DECIMAL(9,2)) END) AS avail_dec,
        |         SUM(CASE WHEN l_shipdate BETWEEN TIMESTAMP '1996-01-01'
        |                                      AND TIMESTAMP '1996-12-31'
        |             THEN CAST(l_quantity AS DECIMAL(9,2))
        |             ELSE CAST(0 AS DECIMAL(9,2)) END) AS ship_dec
        |  FROM lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM part
        |                      WHERE p_name LIKE '%red%')
        |  GROUP BY 1, 2)
        |SELECT s_name, s_acctbal
        |FROM supplier
        |JOIN nation ON n_nationkey = s_nationkey AND n_name = 'NATION_5'
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM pairs
        |  WHERE CAST(ship_dec AS DOUBLE) > 0
        |    AND CAST(avail_dec AS DOUBLE) > 0.5 * CAST(ship_dec AS DOUBLE))
        |ORDER BY s_name""".stripMargin,

    "q21_waiting" ->
      """SELECT s_name, COUNT(*) AS numwait
        |FROM lineitem l1
        |JOIN supplier ON s_suppkey = l1.l_suppkey
        |JOIN nation ON n_nationkey = s_nationkey AND n_name = 'NATION_3'
        |JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
        |WHERE l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 100""".stripMargin
  ).withJoinTwins

  /** The join-based tokenizer kernels are result-identical to their
    * literal-map twins, so they verify against the SAME oracle SQL —
    * the scalable deploy-depth kernel itself sits under the gate. */
  private implicit class OracleTwins(m: Map[String, String]) {
    def withJoinTwins: Map[String, String] = m +
      ("q_unigram_encode_join" -> m("q_unigram_encode")) +
      ("q_wordpiece_encode_join" -> m("q_wordpiece_encode"))
  }
}
