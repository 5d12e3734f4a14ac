"""In-environment training of the learned front-end on the synthetic photo
world.

The reference ships pre-trained SuperPoint/LightGlue ONNX assets
(/root/reference/weights/, consumed by src/Extractors/superpoint_onnx.cc and
src/Matchers/lightglue_onnx.cpp). This environment has no network egress, so
the official checkpoints cannot be fetched; these modules train
small-but-real weights for the SAME architectures on the synthetic photo
world (utils/synthetic.py) — unlimited labeled correspondences — so every
learned path (LightGlue-driven tracking, BoW place recognition,
relocalization) runs on descriptors that actually match, instead of the
random-weight fallback. The torch-checkpoint converters remain the path for
the official weights whenever they are available.
"""
