from mdgat_tpu.data.kitti import (
    load_kitti_gt_txt, make_dataset_kitti_distance, load_calib, load_poses,
    read_keypoint_bin, KEYPOINT_ROW_FLOATS,
)
from mdgat_tpu.data.pipeline import SparseDataset, prepare_batch_fn, model_inputs
from mdgat_tpu.data.prefetch import BatchPrefetcher, prefetch_batches
from mdgat_tpu.data.synthetic import (
    make_synthetic_pair, write_synthetic_kitti, SyntheticDataset,
)
