"""Query battery part — driver oracle entry point (oracle_sql; split from the former single-module queries.py)."""


from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from .b01_core import (
    _dim_np,
    DOC_QUALITY_SQL,
    EMBEDDING_DUPS_SQL,
    ORACLE_SQL,
    _IVF_ANN_SQL,
    _cm_sql,
    _embedding_buckets_sql,
    _fingerprint_sql,
    _gtfs_buffer_stats_sql,
    _gtfs_convex_hull_sql,
    _gtfs_dissolved_stats_sql,
    _gtfs_envelope_sql,
    _gtfs_line_features_sql,
    _gtfs_stop_features_sql,
    _hll_grouped_sql,
    _hll_sql,
    _image_dir_for,
    _image_embeddings_sql,
    _image_hist_sql,
    _image_invariants_sql,
    _image_patch_sql,
    _lang_id_sql,
    _minhash_pairs_sql,
    _phash_neighbor_sql,
    _simhash_pairs_sql,
    _simhash_sql,
    tile_oracle_sql,
)  # noqa: F401

from .b02_events import (
    _audio_dir_for,
    _audio_energy_sql,
    _audio_silence_sql,
    _caption_geo_sql,
    _image_dup_clusters_sql,
    _image_glcm_sql,
    _spatial_autocorr_sql,
    _stop_hulls_sql,
    _tile_pyramid_sql,
)  # noqa: F401

from .b03_misc import (
    _audio_autocorr_sql,
    _audio_half_drift_sql,
    _audio_zcr_sql,
    _bloom_fpr_sql,
    _cell_dominant_sql,
    _crossmodal_sql,
    _dup_degree_sql,
    _image_center_bias_sql,
    _image_gradient_sql,
    _image_median_sql,
    _lang_confusion_sql,
    _phash_popcount_sql,
    _poly_crossings_sql,
    _route_overlap_sql,
    _scene_change_sql,
    _segment_octants_sql,
    _stop_bbox_iou_sql,
    _stop_hull_area_sql,
    _stop_spacing_sql,
    _tile_corridor_sql,
    _tile_viewport_sql,
    _video_dir_for,
    _video_motion_sql,
    _video_sums_sql,
)  # noqa: F401

from .b04_misc import (
    _audio_haar_sql,
    _audio_loudest_sql,
    _audio_onsets_sql,
    _audio_walsh_sql,
    _best_split_sql,
    _blob_count_sql,
    _closest_pair_sql,
    _containment_sql,
    _coverage_holes_sql,
    _cross_source_leakage_sql,
    _disc_tile_counts_sql,
    _hist_eq_sql,
    _image_haar_sql,
    _kcore_sql,
    _largest_blob_sql,
    _mirror_sql,
    _nearest_route_share_sql,
    _otsu_sql,
    _phash_nn_sql,
    _quadkey_occupancy_sql,
    _range_density_sql,
    _sig_agreement_sql,
    _simhash_bit_bias_sql,
    _triplet_sql,
    _video_flicker_sql,
    _video_quadrant_sql,
    _video_thaar_sql,
    _zorder_range_sql,
)  # noqa: F401

from .b05_misc import (
    _audio_decimate_sql,
    _audio_median_sql,
    _audio_peak_sql,
    _blob_geom_sql,
    _cell_gini_sql,
    _cts_sql,
    _dilation_sql,
    _dim_median_sql,
    _disttr_sql,
    _er_canonical_sql,
    _geohash_sql,
    _gray_modes_sql,
    _hex_sql,
    _hilbert_ranges_sql,
    _hog4_sql,
    _int8_quant_sql,
    _kmv_sql,
    _lbp_sql,
    _medoid_sql,
    _mmr_sql,
    _proj_profile_sql,
    _quadtree_sql,
    _rdp_retention_sql,
    _rle_sql,
    _route_coverage_sql,
    _route_headways_sql,
    _route_pair_dist_sql,
    _route_sinuosity_sql,
    _seam_sql,
    _snm_recall_sql,
)  # noqa: F401

from .b06_misc import (
    _audio_clip_sql,
    _audio_half_sql,
    _audio_requant_sql,
    _audio_runs_sql,
    _bipartite_sql,
    _bitplane_sql,
    _blockiness_sql,
    _brightblock_sql,
    _caption_tpl_sql,
    _chancorr_sql,
    _chanorder_sql,
    _coloring_sql,
    _colperiod_sql,
    _euler_sql,
    _f2_sql,
    _kcenter_sql,
    _kmvj_sql,
    _labelprop_sql,
    _matching_sql,
    _medfilt_sql,
    _modalcolor_sql,
    _moravec_sql,
    _motion_centroid_sql,
    _motion_spikes_sql,
    _packing_sql,
    _perimeter_sql,
    _rowtrend_sql,
    _service_days_sql,
    _soundex_sql,
    _stopseq_sql,
    _strat_sample_sql,
    _trace_sql,
    _trip_len_sql,
    _video_sym_sql,
    _xfer_sql,
    _xmod_cov_sql,
)  # noqa: F401

from .b07_misc import (
    _audio_crest_sql,
    _audio_lsb_sql,
    _box_count_sql,
    _bpe_sql,
    _bright_bbox_sql,
    _bright_rect_sql,
    _caption_lift_sql,
    _clockface_sql,
    _cmhh_sql,
    _color_contrast_sql,
    _coverage_curve_sql,
    _diameter_sql,
    _dir_asym_sql,
    _dup_rows_sql,
    _dwell_sql,
    _gram_det_sql,
    _granulo_sql,
    _hopkins_sql,
    _ktruss_sql,
    _leg_speed_sql,
    _lincount_sql,
    _moore_sql,
    _onion_sql,
    _orphan_sql,
    _overtake_sql,
    _palette_sql,
    _rice_sql,
    _saturation_sql,
    _self_xing_sql,
    _shape_orient_sql,
    _shape_seg_bands_sql,
    _slink_sql,
    _texture_dir_sql,
    _transfer_windows_sql,
    _trip_dir_asym_sql,
    _typicality_sql,
    _video_loop_sql,
    _video_ptp_sql,
    _video_rice_sql,
)  # noqa: F401

from .b08_misc import (
    _alias_sql,
    _bridges_sql,
    _buffer_area_sql,
    _bwt_sql,
    _csa_sql,
    _dither_sql,
    _eulerian_sql,
    _fleet_size_sql,
    _frechet_sql,
    _gop_sql,
    _huffman_sql,
    _ima_sql,
    _lcs_sql,
    _lis_sql,
    _lrs_sql,
    _lsh_balance_sql,
    _lsm_sql,
    _lyndon_sql,
    _lz78_sql,
    _merkle_sql,
    _persist_sql,
    _phash_hubness_sql,
    _predictor_sql,
    _rich_club_sql,
    _ring_sql,
    _route_loop_sql,
    _service_span_sql,
    _substr_sql,
    _video_cut_sql,
    _vopt_sql,
)  # noqa: F401

from .b09_misc import (
    _bm_sql,
    _border_sql,
    _boruvka_sql,
    _diam_sql,
    _dtw_sql,
    _ffd_sql,
    _flow_sql,
    _gotoh_sql,
    _gs_sql,
    _hk_sql,
    _hough_sql,
    _hungarian_sql,
    _life_sql,
    _lz77_sql,
    _manacher_sql,
    _mcmf_sql,
    _mh_sql,
    _mst_sql,
    _msub_sql,
    _obst_sql,
    _probe_sql,
    _rect_sql,
    _rho_sql,
    _rmq_sql,
    _rs_sql,
    _scc_sql,
    _stress_sql,
    _sw_sql,
    _tsp_sql,
    _viterbi_sql,
)  # noqa: F401

from .b10_relational import (
    _astar_sql,
    _bwtrt_sql,
    _celf_sql,
    _crc_sql,
    _cs_sql,
    _cuckoo_sql,
    _ear_sql,
    _eh_sql,
    _fm_sql,
    _gf2_sql,
    _gk_sql,
    _h74_sql,
    _hrect_sql,
    _hrwj_sql,
    _hwidth_sql,
    _lca_sql,
    _lehmer_sql,
    _lp_sql,
    _mtf_sql,
    _oa_sql,
    _osa_sql,
    _p2c_sql,
    _rsa_sql,
    _segtree_sql,
    _shap_sql,
    _stab_sql,
    _swaps_sql,
    _t2o_sql,
    _ttc_sql,
    _vote_sql,
    _walks_sql,
    _widest_sql,
    _wiener_sql,
    _winnow_sql,
    _xf_sql,
)  # noqa: F401

from .b11_relational import (
    _activity_sql,
    _adler_sql,
    _auction_sql,
    _bmvote_sql,
    _bst_sql,
    _ck_sql,
    _crt_sql,
    _cw_sql,
    _damm_sql,
    _elo_sql,
    _gf256_sql,
    _gray_sql,
    _grundy_sql,
    _jaro_sql,
    _josephus_sql,
    _kara_sql,
    _kasiski_sql,
    _ks_sql,
    _mcm_sql,
    _med2_sql,
    _mg_sql,
    _mo_sql,
    _necklace_sql,
    _paging_sql,
    _pava_sql,
    _period_sql,
    _poly_sql,
    _prime_sql,
    _prufer_sql,
    _rsk_sql,
    _rsv_sql,
    _runs_sql,
    _s9_sql,
    _sb_sql,
    _spmv_sql,
    _ts_sqrt_sql,
    _zb_sql,
)  # noqa: F401



def oracle_sql() -> dict[str, str]:
    """Full oracle dict for the driver: the static SQL-view oracles plus
    the generated tile oracles at the driver's correctness sf (0.01)."""
    out = dict(ORACLE_SQL)
    out.update(tile_oracle_sql("/root/testdata/sf0.01"))
    out["doc_quality"] = DOC_QUALITY_SQL
    out["embedding_dups"] = EMBEDDING_DUPS_SQL
    out["dup_clusters_embeddings"] = f"""
        WITH RECURSIVE pairs AS ({EMBEDDING_DUPS_SQL}),
        e AS (SELECT a AS u, b AS v FROM pairs
              UNION SELECT b, a FROM pairs),
        walk(u, lbl) AS (
            SELECT u, u FROM (SELECT DISTINCT u FROM e)
            UNION
            SELECT e.u, w.lbl FROM e JOIN walk w ON w.u = e.v
        )
        SELECT u AS node, min(lbl) AS cluster_id FROM walk GROUP BY u
    """
    out["dedup_keep_canonical"] = f"""
        WITH RECURSIVE pairs AS ({EMBEDDING_DUPS_SQL}),
        e AS (SELECT a AS u, b AS v FROM pairs
              UNION SELECT b, a FROM pairs),
        walk(u, lbl) AS (
            SELECT u, u FROM (SELECT DISTINCT u FROM e)
            UNION
            SELECT e.u, w.lbl FROM e JOIN walk w ON w.u = e.v
        ),
        cc AS (SELECT u AS node, min(lbl) AS cluster_id FROM walk GROUP BY u)
        SELECT vec_id FROM embeddings
        WHERE vec_id NOT IN (SELECT node FROM cc)
        UNION ALL
        SELECT node AS vec_id FROM cc WHERE node = cluster_id
    """
    out["embedding_buckets"] = _embedding_buckets_sql()
    out["lang_id_docs"] = _lang_id_sql()
    img01 = _image_dir_for("/root/testdata/sf0.01")
    out["image_invariants"] = _image_invariants_sql(img01)
    out["image_channel_histogram"] = _image_hist_sql(img01)
    out["image_patch_sums"] = _image_patch_sql(img01)
    out["fmt_size_association"] = f"""
        WITH cell AS (SELECT fmt,
                             CASE WHEN w * h >= 1024 THEN 1 ELSE 0 END
                               AS size_class,
                             count(*) AS n
                      FROM read_parquet('{img01}/part-*.parquet')
                      GROUP BY 1, 2),
        m AS (SELECT *, SUM(n) OVER (PARTITION BY fmt) AS r,
                     SUM(n) OVER (PARTITION BY size_class) AS c,
                     SUM(n) OVER () AS nn
              FROM cell)
        SELECT fmt, CAST(size_class AS BIGINT) AS size_class,
               CAST(n AS BIGINT) AS n,
               CAST(n * nn - r * c AS BIGINT) AS dev
        FROM m
    """
    out["caption_stop_stats"] = f"""
        SELECT fmt,
               CAST(string_split(caption, ' ')[5] AS BIGINT) // 4
                 AS stop_bucket,
               count(*) AS n, CAST(SUM(w * h) AS BIGINT) AS sum_px
        FROM read_parquet('{img01}/part-*.parquet') GROUP BY 1, 2
    """
    out["image_embeddings"] = _image_embeddings_sql(img01)
    out["tile_pyramid_counts"] = _tile_pyramid_sql(img01)
    out["caption_geo_consistency"] = _caption_geo_sql(img01)
    out["image_resize"] = f"""
        SELECT image_id, CAST(8 AS BIGINT) AS w, CAST(8 AS BIGINT) AS h,
               TRUE AS mean_ok
        FROM read_parquet('{img01}/part-*.parquet')
        ORDER BY image_id LIMIT 256
    """
    out["gtfs_stop_features"] = _gtfs_stop_features_sql()
    out["gtfs_envelope"] = _gtfs_envelope_sql()
    out["gtfs_line_features"] = _gtfs_line_features_sql()
    out["gtfs_convex_hull"] = _gtfs_convex_hull_sql()
    out["gtfs_buffer_stats"] = _gtfs_buffer_stats_sql()
    out["gtfs_dissolved_stats"] = _gtfs_dissolved_stats_sql()
    sf01 = "/root/testdata/sf0.01"
    out["fingerprint_docs"] = _fingerprint_sql(sf01)
    out["simhash_docs"] = _simhash_sql(sf01)
    out["simhash_pairs_docs"] = _simhash_pairs_sql(sf01)
    out["minhash_pairs_docs"] = _minhash_pairs_sql(sf01)
    out["hll_distinct_users"] = _hll_sql(sf01)
    out["cm_user_counts"] = _cm_sql(sf01)
    out["hll_grouped_users"] = _hll_grouped_sql(sf01)
    out["phash_neighbor_stats"] = _phash_neighbor_sql(img01)
    out["image_dup_clusters"] = _image_dup_clusters_sql(img01)
    out["ivf_ann"] = _IVF_ANN_SQL
    out["image_glcm_energy"] = _image_glcm_sql(img01)
    aud01 = _audio_dir_for("/root/testdata/sf0.01")
    out["audio_frame_energy"] = _audio_energy_sql(aud01)
    out["audio_silence_runs"] = _audio_silence_sql(aud01)
    out["tile_autocorr_cells"] = _spatial_autocorr_sql(img01)
    out["tile_stop_hulls"] = _stop_hulls_sql(img01)
    out["audio_autocorr_tracks"] = _audio_autocorr_sql(aud01)
    out["tile_viewport_query"] = _tile_viewport_sql(img01)
    out["image_median_gray"] = _image_median_sql(img01)
    out["tile_corridor_query"] = _tile_corridor_sql(img01)
    out["cell_dominant_stop"] = _cell_dominant_sql(img01)
    out["segment_octants_routes"] = _segment_octants_sql()
    out["video_frame_sums"] = _video_sums_sql(
        _video_dir_for("/root/testdata/sf0.01"))
    out["lang_confusion_matrix"] = _lang_confusion_sql()
    out["crossmodal_pairing_audit"] = _crossmodal_sql(
        img01, _audio_dir_for("/root/testdata/sf0.01"))
    out["image_center_bias"] = _image_center_bias_sql(img01)
    out["stop_spacing_legs"] = _stop_spacing_sql()
    out["route_overlap_matrix"] = _route_overlap_sql("/root/testdata/sf0.01")
    out["audio_half_drift"] = _audio_half_drift_sql(aud01)
    out["stop_hull_area_parts"] = _stop_hull_area_sql(img01)
    out["dup_degree_hist"] = _dup_degree_sql(sf01)
    out["stop_bbox_iou_pairs"] = _stop_bbox_iou_sql(img01)
    out["phash_popcount_stats"] = _phash_popcount_sql(img01)
    out["audio_zcr_tracks"] = _audio_zcr_sql(aud01)
    out["video_motion_energy"] = _video_motion_sql(
        _video_dir_for("/root/testdata/sf0.01"))
    out["image_gradient_energy"] = _image_gradient_sql(img01)
    out["poly_edge_crossings"] = _poly_crossings_sql()
    out["bloom_fpr_audit"] = _bloom_fpr_sql("/root/testdata/sf0.01")
    out["scene_change_runs"] = _scene_change_sql(
        _video_dir_for("/root/testdata/sf0.01"))
    out["triplet_violation_labels"] = _triplet_sql(sf01)
    out["dup_component_sizes"] = f"""
        WITH RECURSIVE pairs AS ({EMBEDDING_DUPS_SQL}),
        e AS (SELECT a AS u, b AS v FROM pairs
              UNION SELECT b, a FROM pairs),
        walk(u, lbl) AS (
            SELECT u, u FROM (SELECT DISTINCT u FROM e)
            UNION
            SELECT e.u, w.lbl FROM e JOIN walk w ON w.u = e.v
        ),
        cc AS (SELECT u AS node, min(lbl) AS cluster_id
               FROM walk GROUP BY u),
        s AS (SELECT cluster_id, count(*) AS sz FROM cc GROUP BY 1)
        SELECT CAST(sz AS BIGINT) AS size, count(*) AS n_clusters
        FROM s GROUP BY 1
    """
    out["hist_equalize_sums"] = _hist_eq_sql(img01)
    out["phash_nn_images"] = _phash_nn_sql(img01)
    out["blob_count_images"] = _blob_count_sql(img01)
    out["audio_onsets_tracks"] = _audio_onsets_sql(aud01)
    out["range_density_labels"] = _range_density_sql(sf01)
    out["disc_tile_counts"] = _disc_tile_counts_sql(sf01)
    out["mirror_symmetry_images"] = _mirror_sql(img01)
    out["video_flicker_parts"] = _video_flicker_sql(
        _video_dir_for("/root/testdata/sf0.01"))
    out["quadkey_occupancy"] = _quadkey_occupancy_sql(sf01)
    out["simhash_bit_bias"] = _simhash_bit_bias_sql(sf01)
    out["coverage_holes_cells"] = _coverage_holes_sql(sf01)
    out["nearest_route_share"] = _nearest_route_share_sql(sf01)
    out["cross_source_leakage"] = _cross_source_leakage_sql(sf01)
    out["closest_pair_tiles"] = _closest_pair_sql(sf01)
    out["audio_loudest_window"] = _audio_loudest_sql(aud01)
    out["otsu_threshold_images"] = _otsu_sql(img01)
    out["kcore_dups"] = _kcore_sql(sf01)
    out["audio_haar_detail_tracks"] = _audio_haar_sql(aud01)
    out["video_quadrant_motion"] = _video_quadrant_sql(
        _video_dir_for("/root/testdata/sf0.01"))
    out["zorder_range_counts"] = _zorder_range_sql(img01)
    out["image_haar_bands"] = _image_haar_sql(img01)
    out["audio_walsh_bands"] = _audio_walsh_sql(aud01)
    out["best_split_daily"] = _best_split_sql(sf01)
    out["largest_blob_images"] = _largest_blob_sql(img01)
    out["containment_pairs_docs"] = _containment_sql(sf01)
    out["video_temporal_haar"] = _video_thaar_sql(
        _video_dir_for("/root/testdata/sf0.01"))
    out["sig_agreement_pairs_docs"] = _sig_agreement_sql(sf01)
    out["gray_modes_images"] = _gray_modes_sql(img01)
    out["audio_peak_tracks"] = _audio_peak_sql(aud01)
    out["quadtree_depth_images"] = _quadtree_sql(img01)
    out["route_sinuosity_parts"] = _route_sinuosity_sql()
    out["rdp_retention_shapes"] = _rdp_retention_sql()
    out["hilbert_range_counts"] = _hilbert_ranges_sql(img01)
    out["kmv_distinct_users"] = _kmv_sql(sf01)
    out["rle_runs_images"] = _rle_sql(img01)
    out["mmr_topk_embeddings"] = _mmr_sql(sf01)
    out["audio_decimate_tracks"] = _audio_decimate_sql(aud01)
    out["route_headways"] = _route_headways_sql()
    out["blob_geometry_images"] = _blob_geom_sql(img01)
    out["geohash_cell_counts"] = _geohash_sql(img01)
    out["dilation_area_images"] = _dilation_sql(img01)
    out["component_threshold_sweep_dups"] = _cts_sql()
    out["route_coverage_deciles"] = _route_coverage_sql(img01)
    out["snm_recall_audit"] = _snm_recall_sql()
    out["dim_median_embeddings"] = _dim_median_sql(sf01)
    out["int8_quant_audit_embeddings"] = _int8_quant_sql(sf01)
    out["proj_profile_images"] = _proj_profile_sql(img01)
    out["lbp_texture_images"] = _lbp_sql(img01)
    out["route_pair_min_vertex_dist"] = _route_pair_dist_sql()
    out["seam_energy_images"] = _seam_sql(img01)
    out["hog4_images"] = _hog4_sql(img01)
    out["audio_median_abs_tracks"] = _audio_median_sql(aud01)
    out["er_canonical_docs"] = _er_canonical_sql()
    out["medoid_dup_clusters"] = _medoid_sql()
    out["cell_count_gini"] = _cell_gini_sql(img01)
    out["hex_cell_counts"] = _hex_sql(img01)
    out["dist_transform_images"] = _disttr_sql(img01)
    out["median_filter_images"] = _medfilt_sql(img01)
    out["greedy_matching_dups"] = _matching_sql(sf01)
    out["audio_requant_audit"] = _audio_requant_sql(aud01)
    out["kcenter_seeds_embeddings"] = _kcenter_sql(sf01)
    out["kmv_jaccard_types"] = _kmvj_sql(sf01)
    out["motion_centroid_clips"] = _motion_centroid_sql(
        _video_dir_for("/root/testdata/sf0.01"))
    out["bitplane_census_images"] = _bitplane_sql(img01)
    out["greedy_coloring_dups"] = _coloring_sql(sf01)
    out["brightest_block_images"] = _brightblock_sql(img01)
    out["audio_monotone_runs"] = _audio_runs_sql(aud01)
    out["f2_sketch_users"] = _f2_sql(sf01)
    out["coverage_perimeter_cells"] = _perimeter_sql(img01)
    out["moravec_corners_images"] = _moravec_sql(img01)
    out["majority_label_prop_dups"] = _labelprop_sql(sf01)
    out["stratified_cell_sample"] = _strat_sample_sql(img01)
    out["packing_plan_sources"] = _packing_sql(sf01)
    out["audio_clipping_audit"] = _audio_clip_sql(aud01)
    out["soundex_classes_docs"] = _soundex_sql(sf01)
    out["blockiness_images"] = _blockiness_sql(img01)
    out["stop_transfer_pairs"] = _xfer_sql()
    out["video_time_symmetry"] = _video_sym_sql(
        _video_dir_for("/root/testdata/sf0.01"))
    out["channel_corr_images"] = _chancorr_sql(img01)
    out["trip_length_hist"] = _trip_len_sql()
    out["column_period_images"] = _colperiod_sql(img01)
    out["shape_cell_trace"] = _trace_sql()
    out["bipartite_audit_dups"] = _bipartite_sql(sf01)
    out["row_trend_images"] = _rowtrend_sql(img01)
    out["audio_halftime"] = _audio_half_sql(aud01)
    out["stop_seq_contiguity"] = _stopseq_sql()
    out["motion_spikes_clips"] = _motion_spikes_sql(
        _video_dir_for("/root/testdata/sf0.01"))
    out["modal_color_images"] = _modalcolor_sql(img01)
    out["caption_templates_images"] = _caption_tpl_sql(img01)
    out["caption_brightness_cov"] = _xmod_cov_sql(img01)
    out["service_days_gtfs"] = _service_days_sql()
    out["channel_order_census"] = _chanorder_sql(img01)
    out["euler_quad_images"] = _euler_sql(img01)
    out["audio_crest_factor"] = _audio_crest_sql(aud01)
    out["video_pixel_range_hist"] = _video_ptp_sql(
        _video_dir_for("/root/testdata/sf0.01"))
    out["cm_heavy_hitters_audit"] = _cmhh_sql(sf01)
    out["palette_quant_images"] = _palette_sql(img01)
    out["dup_diameter_sweep"] = _diameter_sql(sf01)
    out["shape_seg_length_bands"] = _shape_seg_bands_sql()
    out["saturation_census_images"] = _saturation_sql(img01)
    out["audio_lsb_bias"] = _audio_lsb_sql(aud01)
    out["gtfs_leg_speed_audit"] = _leg_speed_sql()
    out["granulometry_images"] = _granulo_sql(img01)
    out["gtfs_transfer_windows"] = _transfer_windows_sql()
    out["bpe_merges_docs"] = _bpe_sql(sf01)
    out["gram_det_embeddings"] = _gram_det_sql(sf01)
    out["route_color_contrast"] = _color_contrast_sql()
    out["rice_coding_tracks"] = _rice_sql(aud01)
    out["shape_orientation_audit"] = _shape_orient_sql()
    out["bright_rect_images"] = _bright_rect_sql(img01)
    out["video_loop_period"] = _video_loop_sql(
        _video_dir_for("/root/testdata/sf0.01"))
    out["coverage_saturation_curve"] = _coverage_curve_sql(img01)
    out["single_linkage_merges"] = _slink_sql(sf01)
    out["caption_token_brightness_lift"] = _caption_lift_sql(img01)
    out["stop_dwell_census"] = _dwell_sql()
    out["texture_direction_census"] = _texture_dir_sql(img01)
    out["direction_stop_asymmetry"] = _dir_asym_sql()
    out["box_count_images"] = _box_count_sql(img01)
    out["cell_moore_census"] = _moore_sql(img01)
    out["clockface_schedule_audit"] = _clockface_sql()
    out["linear_counting_users"] = _lincount_sql(sf01)
    out["hopkins_clusterability"] = _hopkins_sql()
    out["gtfs_orphan_audit"] = _orphan_sql()
    out["onion_profile_images"] = _onion_sql(img01)
    out["typicality_outlier_images"] = _typicality_sql(img01)
    out["video_rice_temporal"] = _video_rice_sql(
        _video_dir_for("/root/testdata/sf0.01"))
    out["bright_bbox_images"] = _bright_bbox_sql(img01)
    out["trip_duration_direction_asymmetry"] = _trip_dir_asym_sql()
    out["ktruss_dups"] = _ktruss_sql(sf01)
    out["shape_self_intersections"] = _self_xing_sql()
    out["dup_rows_images"] = _dup_rows_sql(img01)
    out["schedule_overtake_audit"] = _overtake_sql()
    out["route_loop_audit"] = _route_loop_sql()
    out["rich_club_dups"] = _rich_club_sql(sf01)
    out["lis_customer_orders"] = _lis_sql(sf01)
    out["huffman_cost_sources"] = _huffman_sql(sf01)
    out["lz78_parse_sources"] = _lz78_sql(sf01)
    out["eulerian_audit_routes"] = _eulerian_sql()
    out["distinct_substrings_docs"] = _substr_sql(sf01)
    out["bridges_dups"] = _bridges_sql(sf01)
    out["audio_predictor_order_audit"] = _predictor_sql(aud01)
    out["stop_service_span"] = _service_span_sql()
    out["bwt_runs_sources"] = _bwt_sql(sf01)
    out["phash_hubness_images"] = _phash_hubness_sql(img01)
    out["fleet_size_routes"] = _fleet_size_sql()
    out["lyndon_factors_sources"] = _lyndon_sql(sf01)
    out["video_cut_audit"] = _video_cut_sql(
        _video_dir_for("/root/testdata/sf0.01"))
    out["alias_table_nations"] = _alias_sql(sf01)
    out["voptimal_hist_weekly"] = _vopt_sql(sf01)
    out["lsh_bucket_balance_embeddings"] = _lsh_balance_sql(sf01)
    out["buffer_area_audit_routes"] = _buffer_area_sql()
    out["frechet_direction_gap_routes"] = _frechet_sql()
    out["csa_earliest_arrival"] = _csa_sql()
    out["merkle_root_orders"] = _merkle_sql(sf01)
    out["lrs_census_sources"] = _lrs_sql(sf01)
    out["lcs_adjacent_docs"] = _lcs_sql(sf01)
    out["lsm_compaction_sim_daily"] = _lsm_sql(sf01)
    out["ring_rebalance_orders"] = _ring_sql(sf01)
    out["ima_adpcm_tracks"] = _ima_sql(aud01)
    out["dither_fs_images"] = _dither_sql(img01)
    out["persistence_census_images"] = _persist_sql(img01)
    out["gop_plan_clips"] = _gop_sql(
        _video_dir_for("/root/testdata/sf0.01"))
    out["block_match_motion_clips"] = _bm_sql(
        _video_dir_for("/root/testdata/sf0.01"))
    out["dtw_adjacent_tracks"] = _dtw_sql(aud01)
    out["viterbi_segments_users"] = _viterbi_sql(sf01)
    out["border_census_docs"] = _border_sql(sf01)
    out["hungarian_match_nations"] = _hungarian_sql(sf01)
    out["hough_peak_images"] = _hough_sql(img01)
    out["mst_cells_tiles"] = _mst_sql(img01)
    out["gotoh_adjacent_docs"] = _gotoh_sql(sf01)
    out["rho_cycle_orders"] = _rho_sql(sf01)
    out["rmq_day_ranges"] = _rmq_sql(sf01)
    out["ffd_binpack_weekly"] = _ffd_sql(sf01)
    out["obst_sources"] = _obst_sql(sf01)
    out["moore_hodgson_weekly"] = _mh_sql(sf01)
    out["hopcroft_karp_dups"] = _hk_sql(sf01)
    out["manacher_docs"] = _manacher_sql(sf01)
    out["max_submatrix_images"] = _msub_sql(img01)
    out["dinic_flow_nations"] = _flow_sql(sf01)
    out["gale_shapley_nations"] = _gs_sql(sf01)
    out["rect_union_cells"] = _rect_sql(img01)
    out["hull_diameter_cells"] = _diam_sql(img01)
    out["stoer_wagner_dups"] = _sw_sql(sf01)
    out["held_karp_tsp_cells"] = _tsp_sql(img01)
    out["life_census_images"] = _life_sql(img01)
    out["probe_count_weekly"] = _probe_sql(sf01)
    out["json_props_stats"] = ORACLE_SQL["json_props_stats"]
    out["stress_centrality_dups"] = _stress_sql(sf01)
    out["boruvka_mst_cells"] = _boruvka_sql(img01)
    out["rs_erasure_weekly"] = _rs_sql(sf01)
    out["lz77_parse_docs"] = _lz77_sql(sf01)
    out["mcmf_nations"] = _mcmf_sql(sf01)
    out["scc_census_orders"] = _scc_sql(sf01)
    out["eh_window_counts_users"] = _eh_sql(sf01)
    out["winnowing_docs"] = _winnow_sql(sf01)
    out["two_choice_load_orders"] = _p2c_sql(sf01)
    out["stab_count_sessions"] = _stab_sql(sf01)
    out["walk_counts_dups"] = _walks_sql(sf01)
    out["linear_partition_days"] = _lp_sql(sf01)
    out["mtf_codes_docs"] = _mtf_sql(sf01)
    out["count_sketch_users"] = _cs_sql(sf01)
    out["fm_pcsa_users"] = _fm_sql(sf01)
    out["min_swaps_weekly"] = _swaps_sql(sf01)
    out["osa_adjacent_docs"] = _osa_sql(sf01)
    out["crc32_docs"] = _crc_sql(sf01)
    out["hamming74_tracks"] = _h74_sql(aud01)
    out["hrw_jump_rebalance_orders"] = _hrwj_sql(sf01)
    out["ear_clip_routes"] = _ear_sql(sf01)
    out["gk_quantiles_orders"] = _gk_sql(sf01)
    out["open_addressing_weekly"] = _oa_sql(sf01)
    out["xor_filter_orders"] = _xf_sql(sf01)
    out["histogram_rect_days"] = _hrect_sql(sf01)
    out["rolling_median_days"] = ORACLE_SQL["rolling_median_days"]
    out["rsa_roundtrip_orders"] = _rsa_sql(sf01)
    out["rank_gf2_sources"] = _gf2_sql(sf01)
    out["gcd_census_orders"] = ORACLE_SQL["gcd_census_orders"]
    out["lehmer_rank_weekly"] = _lehmer_sql(sf01)
    out["celf_coverage_tiles"] = _celf_sql(img01)
    out["shapley_power_nations"] = _shap_sql(sf01)
    out["widest_path_cells"] = _widest_sql(img01)
    out["ttc_exchange_nations"] = _ttc_sql(sf01)
    out["voting_methods_nations"] = _vote_sql(sf01)
    out["hull_width_cells"] = _hwidth_sql(img01)
    out["bwt_roundtrip_docs"] = _bwtrt_sql(sf01)
    out["wiener_index_dups"] = _wiener_sql(sf01)
    out["tsp_2opt_gap_cells"] = _t2o_sql(img01)
    out["astar_cells"] = _astar_sql(img01)
    out["lazy_segtree_days"] = _segtree_sql(sf01)
    out["cuckoo_insert_orders"] = _cuckoo_sql(sf01)
    out["lca_binarylift_dups"] = _lca_sql(sf01)
    out["zeller_dow_orders"] = ORACLE_SQL["zeller_dow_orders"]
    out["horner_estrin_days"] = _poly_sql(sf01)
    out["jaro_adjacent_docs"] = _jaro_sql(sf01)
    out["montgomery_redc_orders"] = _mg_sql(sf01)
    out["karatsuba_bigint_sources"] = _kara_sql(sf01)
    out["prufer_roundtrip_dups"] = _prufer_sql(sf01)
    out["simpson_paradox_nations"] = ORACLE_SQL["simpson_paradox_nations"]
    out["activity_selection_weekly"] = _activity_sql(sf01)
    out["median_two_shards_orders"] = _med2_sql(sf01)
    out["majority_vote_users"] = _bmvote_sql(sf01)
    out["gray_roundtrip_orders"] = _gray_sql(sf01)
    out["spmv_csr_docs"] = _spmv_sql(sf01)
    out["auction_assignment_nations"] = _auction_sql(sf01)
    out["welford_users"] = ORACLE_SQL["welford_users"]
    out["knapsack_mitm_nations"] = _ks_sql(sf01)
    out["prime_keys_orders"] = _prime_sql(sf01)
    out["necklace_census_weeks"] = _necklace_sql(sf01)
    out["dominance_pairs_parts"] = ORACLE_SQL["dominance_pairs_parts"]
    out["run_formation_orders"] = _runs_sql(sf01)
    out["cache_paging_orders"] = _paging_sql(sf01)
    out["matrix_chain_days"] = _mcm_sql(sf01)
    out["stern_brocot_orders"] = _sb_sql(sf01)
    out["damm_audit_orders"] = _damm_sql(sf01)
    out["zorder_bigmin_query"] = _zb_sql(img01)
    out["mo_range_distinct_days"] = _mo_sql(sf01)
    out["rank_select_days"] = _rsv_sql(sf01)
    out["gf256_docs"] = _gf256_sql(sf01)
    out["crt_bezout_orders"] = _crt_sql(sf01)
    out["tonelli_orders"] = _ts_sqrt_sql(sf01)
    out["kasiski_docs"] = _kasiski_sql(sf01)
    out["ckmeans_days"] = _ck_sql(sf01)
    out["pava_days"] = _pava_sql(sf01)
    out["grundy_weekly"] = _grundy_sql(sf01)
    out["josephus_weekly"] = _josephus_sql(sf01)
    out["rsk_weekly"] = _rsk_sql(sf01)
    out["bst_height_weekly"] = _bst_sql(sf01)
    out["carter_wegman_orders"] = _cw_sql(sf01)
    out["decimal_period_orders"] = _period_sql(sf01)
    out["elo_weekly_nations"] = _elo_sql(sf01)
    out["adler32_docs"] = _adler_sql(sf01)
    out["simple9_users"] = _s9_sql(sf01)
    return out

__defined__ = (
    'oracle_sql',
)
