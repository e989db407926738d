"""TPU-native compute kernels (XLA + Pallas).

Each CUDA/native dependency of the reference maps to a module here
(SURVEY.md §2.4):

* ``msda``        — MultiScaleDeformableAttention (CUDA ext -> pure-XLA
                    gather/lerp, Pallas variant in ``msda_pallas``).
* ``tfl``         — Template Fitting Loss (faiss range_search -> distance
                    fields + batched membership counts).
* ``box3d``       — rotated 3D box IoU / NMS (pytorch3d box3d_overlap +
                    numba-CUDA rotate_iou -> vmapped polygon clipping).
* ``geometry``    — transforms, backprojection, voxel downsampling
                    (open3d / point_cloud_utils equivalents).
* ``knn``         — brute-force kNN / range counting (faiss equivalent).
* ``lap``         — linear assignment (Hungarian matcher backend).
"""
