"""Minimal, dependency-light TensorBoard event writer.

Capability parity with the reference writer (reference: tensorboard.py:29-101,
itself objax-derived): scalar/text/image summaries via the tensorboard
package's ``EventFileWriter``, flushed on exit. No TF runtime dependency
beyond the summary protos.
"""

from __future__ import annotations

import os

import numpy as np


class TensorboardWriter:
    def __init__(self, logdir: str, queue_size: int = 5,
                 write_interval_s: int = 5):
        from tensorboard.summary.writer.event_file_writer import (
            EventFileWriter,
        )

        os.makedirs(logdir, exist_ok=True)
        self._writer = EventFileWriter(
            logdir, queue_size, write_interval_s)

    def scalar(self, tag: str, value, step: int):
        from tensorboard.compat.proto import event_pb2, summary_pb2

        summary = summary_pb2.Summary(value=[
            summary_pb2.Summary.Value(
                tag=tag, simple_value=float(np.asarray(value)))
        ])
        self._add(summary, step)

    def text(self, tag: str, text: str, step: int):
        from tensorboard.compat.proto import summary_pb2, tensor_pb2
        from tensorboard.compat.proto.tensor_shape_pb2 import (
            TensorShapeProto,
        )

        tensor = tensor_pb2.TensorProto(
            dtype="DT_STRING",
            string_val=[text.encode("utf-8")],
            tensor_shape=TensorShapeProto(
                dim=[TensorShapeProto.Dim(size=1)]),
        )
        meta = summary_pb2.SummaryMetadata(
            plugin_data=summary_pb2.SummaryMetadata.PluginData(
                plugin_name="text"))
        summary = summary_pb2.Summary(value=[
            summary_pb2.Summary.Value(
                tag=tag + "/text_summary", metadata=meta, tensor=tensor)
        ])
        self._add(summary, step)

    def image(self, tag: str, image, step: int):
        """image: [H, W, C] uint8 (C in {1, 3, 4})."""
        import io

        from PIL import Image as PILImage
        from tensorboard.compat.proto import summary_pb2

        image = np.asarray(image)
        buf = io.BytesIO()
        PILImage.fromarray(image).save(buf, format="PNG")
        summary = summary_pb2.Summary(value=[
            summary_pb2.Summary.Value(
                tag=tag,
                image=summary_pb2.Summary.Image(
                    height=image.shape[0],
                    width=image.shape[1],
                    colorspace=image.shape[2] if image.ndim == 3 else 1,
                    encoded_image_string=buf.getvalue(),
                ))
        ])
        self._add(summary, step)

    def _add(self, summary, step):
        import time

        from tensorboard.compat.proto import event_pb2

        self._writer.add_event(event_pb2.Event(
            wall_time=time.time(), step=int(step), summary=summary))

    def flush(self):
        self._writer.flush()

    def __del__(self):
        try:
            self._writer.flush()
        except Exception:
            pass
