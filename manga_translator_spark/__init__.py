"""manga_translator_spark — a PySpark-native main-content extraction engine.

A from-scratch transplant of the staged dataflow pipeline of
TareHimself/manga-translator (detect regions -> segment -> clean -> recognize
-> filter -> assemble -> composite; see /root/reference) onto web documents:

    parse html:binary -> flattened DOM block array   (detector analogue)
    text/link-density block classifier               (segmenter/scorer analogue)
    boilerplate strip                                (cleaner analogue)
    batched recognition of image-embedded text       (OCR analogue)
    ordered reassembly into text + char spans/url    (drawer/composite analogue)

Everything is DataFrame-first: mapInPandas / Arrow-batched stages for the
parse+recognize steps, pure ``pyspark.sql.functions`` (incl. higher-order
array functions and window functions) for scoring, stripping and assembly.
Correctness is gated on byte-identical extracted text per url against the
single-process oracle in :mod:`manga_translator_spark.oracle`.
"""

__version__ = "0.1.0"
