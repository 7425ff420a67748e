from .chunker import preprocess_dir, preprocess_document
from .contract import ChunkRecord, load_processed_dir, parse_processed_json
from .corpus import CorpusIndex, build_corpus_index
from .ocr import OCRModel, ocr_page, ocr_pages_to_processed, train_ocr

__all__ = [
    "OCRModel",
    "train_ocr",
    "ocr_page",
    "ocr_pages_to_processed",
    "ChunkRecord",
    "parse_processed_json",
    "load_processed_dir",
    "CorpusIndex",
    "build_corpus_index",
    "preprocess_document",
    "preprocess_dir",
]
