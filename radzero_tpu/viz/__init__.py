from radzero_tpu.viz.overlays import (
    extract_similarity_map,
    overlay_heatmap,
    render_attention_panel,
)
