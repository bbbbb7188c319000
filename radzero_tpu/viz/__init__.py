from radzero_tpu.viz.overlays import (
    extract_similarity_map,
    overlay_heatmap,
    render_attention_panel,
)
from radzero_tpu.viz.qualitative import (
    filter_top_k_percent,
    process_and_visualize_map,
    process_and_visualize_segmentation,
    visualize_disease_segmap,
    visualize_segmap,
)
