"""pycocotools.coco shim: the oracles register in-memory dataset dicts
via DatasetCatalog (export_object_detection_bounding_boxes.py:258), so
the COCO-json loader class is import-time-only."""


class COCO:
    def __init__(self, annotation_file=None):
        raise NotImplementedError(
            "pycocotools.COCO is out of the oracle shim's scope; the oracles "
            "register in-memory dataset dicts instead"
        )
