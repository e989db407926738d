"""Host-side data pipeline for detector training: KITTI dataset, label
encoding with the Canonical Object Space module, augmentation."""
