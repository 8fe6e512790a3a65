"""wssdl_bus_tpu — a TPU-native (JAX/XLA/Pallas) framework for joint weakly and
semi-supervised breast-ultrasound mass detection.

Re-designed from scratch after the capabilities of the TF1/CUDA reference
implementation of "Joint Weakly and Semi-Supervised Deep Learning for
Localization and Classification of Masses in Breast Ultrasound Images"
(IEEE TMI 2019).  Everything on the compute path is pure-functional JAX with
static padded shapes so the whole training/inference step compiles to a single
XLA program on TPU; host round-trips (the reference's ``tf.py_func`` detection
ops and custom CUDA kernels) do not exist here.

Package layout:
  config     — layered configuration (defaults / YAML / CLI overrides)
  ops        — detection geometry + kernels: anchors, box transforms, IoU,
               NMS, proposal/anchor-target/proposal-target layers, ROI pooling
  models     — VGG16 and preact-ResNet{18,34,50,101} backbones, RPN/RCNN heads
  mil        — multiple-instance-learning bag losses (the paper's novelty)
  data       — SNUBH_BUS dataset, augmentation, fixed-shape minibatch packing
  train      — losses, LR schedules, solver (combined + alternating regimes)
  evaluate   — im_detect/test_net, VOC AP + CorLoc + FROC metrics
  parallel   — jax.sharding mesh utilities, data-parallel train steps
  utils      — timers, logging, profiling
"""

__version__ = "0.1.0"
