"""Flax model zoo: Darknet/YOLOv3, ResNet-FPN, RetinaNet, Faster/Mask R-CNN,
SSD. All modules are NHWC with a configurable compute dtype (bfloat16 on
TPU), parameters in float32."""
