"""Backbones, heads and the detector assembly."""

from wssdl_bus_tpu.models.detector import (FasterRCNN, build_detector)
