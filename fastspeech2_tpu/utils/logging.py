"""TensorBoard + plaintext logging (reference utils/tools.py:69-88,
train.py:53-58,99-111 layout: Loss/{total,mel,mel_postnet,pitch,energy,
duration} scalars, mel figures, audio samples, mirrored log.txt lines)."""

import os


class TrainLogger:
    def __init__(self, log_path):
        os.makedirs(log_path, exist_ok=True)
        try:
            from tensorboardX import SummaryWriter

            self.writer = SummaryWriter(log_path)
        except ImportError:  # pragma: no cover
            self.writer = None
        self.text_log = os.path.join(log_path, "log.txt")

    def scalars(self, step, losses):
        names = ["total_loss", "mel_loss", "mel_postnet_loss", "pitch_loss",
                 "energy_loss", "duration_loss"]
        if self.writer is not None:
            for name, value in zip(names, losses):
                self.writer.add_scalar(f"Loss/{name}", float(value), step)

    def figure(self, tag, fig, step=None):
        if self.writer is not None:
            self.writer.add_figure(tag, fig, step)

    def audio(self, tag, wav, sampling_rate, step=None):
        if self.writer is not None:
            peak = max(abs(wav.min()), abs(wav.max()), 1)
            self.writer.add_audio(tag, wav / peak, step,
                                  sample_rate=sampling_rate)

    def message(self, text):
        with open(self.text_log, "a") as f:
            f.write(text + "\n")

    def close(self):
        if self.writer is not None:
            self.writer.close()
