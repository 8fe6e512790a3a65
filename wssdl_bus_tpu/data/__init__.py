"""SNUBH_BUS dataset, augmentation and fixed-shape minibatch assembly."""

from wssdl_bus_tpu.data.dataset import (BusDataset, get_imdb,
                                        get_test_roidb, get_training_roidb,
                                        prepare_roidb)
from wssdl_bus_tpu.data.loader import (RoIDataLayer, RoIDataLayerJoint,
                                       get_data_layer)
