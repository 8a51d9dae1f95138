from video3d_tpu.ops.geometry import (
    unproject,
    compose_poses,
    resize_nearest,
    center_crop,
    average_coordinate_in_patch,
    minmax_coordinate_in_patch,
    sample_n_points,
    discrete_coords,
    bilinear_pool_2d,
    pool_2d_tokens,
)
from video3d_tpu.ops.pos_embed import sin3d_position_embedding
from video3d_tpu.ops.mc_select import (greedy_select_frames,
                                       select_prefix_by_ratio)
from video3d_tpu.ops.box import box3d_iou, convert_pc_to_box, iou_matrix
