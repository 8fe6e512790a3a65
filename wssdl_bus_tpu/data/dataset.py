"""SNUBH_BUS dataset ("imdb") layer.

Re-implements the reference dataset stack
(``/root/reference/code/lib/datasets/bus.py``, ``imdb.py``,
``roi_data_layer/roidb.py``) without the TF/Caffe baggage:

  * 3 classes: __background__ / benign / malignant (bus.py:28-29);
  * ``.tif`` grayscale images under TIFFImages/, VOC-style XML under
    Annotations/ with 0-based corrections and explicit background
    (normal-tissue) objects kept as class 0 (bus.py:176-223);
  * per-image BIRADS diagnosis label ``birads_diag = diag + 1`` (bus.py:216);
  * split files ImageSets/Main/<split>.txt (bus.py:68-80);
  * horizontal-flip augmentation doubling the index (imdb.py:106-123);
  * roidb preparation: image path/size, max_overlaps/max_classes
    (roidb.py:18-39).

The gt pickle cache (bus.py:89-108) is optional here and defaults OFF — the
reference writes into the dataset tree, which we never do.
"""

from __future__ import annotations

import os
import pickle
import xml.etree.ElementTree as ET
from typing import Dict, List, Optional

import numpy as np
from PIL import Image

CLASSES = ("__background__", "benign", "malignant")
CLASS_TO_IND = {c: i for i, c in enumerate(CLASSES)}

# Splits the reference registers (datasets/factory_bus.py:13-17).
SPLITS = (
    ["s_train", "s_train_10", "s_train_50", "s_train_100", "s_train_200",
     "s_train_400", "s_train_600",
     "ws_train", "ws_train_10", "ws_train_50", "ws_train_100", "ws_train_200",
     "ws_train_400", "ws_train_600",
     "train", "reduced_ws_train", "test", "test_normal",
     "s_train_datasetB", "test_datasetB"])


class BusDataset:
    """The ``bus`` imdb."""

    def __init__(self, image_set: str, data_dir: str,
                 cache_dir: Optional[str] = None):
        self.name = "bus_" + image_set
        self.image_set = image_set
        self.data_dir = data_dir
        self.cache_dir = cache_dir
        self.classes = CLASSES
        self.num_classes = len(CLASSES)
        self._image_ext = ".tif"
        self.image_index = self._load_image_set_index()
        self._roidb: Optional[List[dict]] = None

    # ------------------------------------------------------------------ #
    def _load_image_set_index(self) -> List[str]:
        path = os.path.join(self.data_dir, "ImageSets", "Main",
                            self.image_set + ".txt")
        with open(path) as f:
            return [x.strip() for x in f if x.strip()]

    def image_path_at(self, i: int) -> str:
        return os.path.join(self.data_dir, "TIFFImages",
                            self.image_index[i] + self._image_ext)

    @property
    def num_images(self) -> int:
        return len(self.image_index)

    def read_image(self, i: int) -> np.ndarray:
        """Grayscale uint8 [H, W] (replication to 3 channels happens at blob
        assembly, minibatch_bus.py:269-270)."""
        return np.asarray(Image.open(self.image_path_at(i)))

    # ------------------------------------------------------------------ #
    def _load_annotation(self, index: str) -> dict:
        """Parse one VOC-style XML (bus.py:176-223)."""
        path = os.path.join(self.data_dir, "Annotations", index + ".xml")
        tree = ET.parse(path)
        objs = [o for o in tree.findall("object")
                if int(o.find("difficult").text) == 0]
        n = len(objs)
        boxes = np.zeros((n, 4), np.uint16)
        gt_classes = np.zeros((n,), np.int32)
        overlaps = np.zeros((n, self.num_classes), np.float32)
        seg_areas = np.zeros((n,), np.float32)
        for ix, obj in enumerate(objs):
            bb = obj.find("bndbox")
            x1 = float(bb.find("xmin").text) - 1
            y1 = float(bb.find("ymin").text) - 1
            x2 = float(bb.find("xmax").text) - 1
            y2 = float(bb.find("ymax").text) - 1
            cls = CLASS_TO_IND[obj.find("name").text.lower().strip()]
            boxes[ix] = [x1, y1, x2, y2]
            gt_classes[ix] = cls
            overlaps[ix, cls] = 1.0
            seg_areas[ix] = (x2 - x1 + 1) * (y2 - y1 + 1)
        birads_diag = int(tree.findall("BIRADS")[0].find("diag").text) + 1
        return {"boxes": boxes, "gt_classes": gt_classes,
                "gt_overlaps": overlaps, "flipped": False,
                "seg_areas": seg_areas, "birads_diag": birads_diag}

    @property
    def roidb(self) -> List[dict]:
        if self._roidb is not None:
            return self._roidb
        cache_file = None
        if self.cache_dir:
            os.makedirs(self.cache_dir, exist_ok=True)
            cache_file = os.path.join(self.cache_dir,
                                      self.name + "_gt_roidb.pkl")
            if os.path.exists(cache_file):
                with open(cache_file, "rb") as f:
                    self._roidb = pickle.load(f)
                return self._roidb
        self._roidb = [self._load_annotation(ix) for ix in self.image_index]
        if cache_file:
            with open(cache_file, "wb") as f:
                pickle.dump(self._roidb, f)
        return self._roidb

    # ------------------------------------------------------------------ #
    def append_flipped_images(self) -> None:
        """Double the roidb with horizontally flipped entries
        (imdb.py:106-123)."""
        roidb = self.roidb
        num = self.num_images
        widths = [Image.open(self.image_path_at(i)).size[0]
                  for i in range(num)]
        for i in range(num):
            boxes = roidb[i]["boxes"].copy()
            old_x1 = boxes[:, 0].copy()
            old_x2 = boxes[:, 2].copy()
            boxes[:, 0] = widths[i] - old_x2 - 1
            boxes[:, 2] = widths[i] - old_x1 - 1
            assert (boxes[:, 2] >= boxes[:, 0]).all()
            roidb.append({"boxes": boxes,
                          "gt_overlaps": roidb[i]["gt_overlaps"],
                          "gt_classes": roidb[i]["gt_classes"],
                          "flipped": True,
                          "birads_diag": roidb[i]["birads_diag"]})
        self.image_index = self.image_index * 2

    def evaluate_detections(self, all_boxes, output_dir, suffix=None):
        from wssdl_bus_tpu.evaluate.voc_eval import evaluate_bus_detections
        return evaluate_bus_detections(self, all_boxes, output_dir)


def prepare_roidb(imdb: BusDataset) -> List[dict]:
    """Attach derived metadata (roidb.py:18-39)."""
    roidb = imdb.roidb
    sizes = [Image.open(imdb.image_path_at(i)).size
             for i in range(imdb.num_images)]
    for i in range(len(imdb.image_index)):
        roidb[i]["image"] = imdb.image_path_at(i)
        roidb[i]["width"] = sizes[i][0]
        roidb[i]["height"] = sizes[i][1]
        gt_overlaps = roidb[i]["gt_overlaps"]
        roidb[i]["max_overlaps"] = gt_overlaps.max(axis=1)
        roidb[i]["max_classes"] = gt_overlaps.argmax(axis=1)
    return roidb


def get_training_roidb(imdb: BusDataset, use_flipped: bool = True):
    """Flip-augment + prepare (train_bus.py:1016-1034)."""
    if use_flipped:
        imdb.append_flipped_images()
    return prepare_roidb(imdb)


def get_imdb(name: str, data_dir: str, cache_dir: Optional[str] = None
             ) -> BusDataset:
    """Dataset factory (datasets/factory_bus.py:23-27)."""
    if not name.startswith("bus_"):
        raise KeyError(f"Unknown dataset: {name}")
    split = name[len("bus_"):]
    return BusDataset(split, data_dir, cache_dir)
