from tacotron_tpu.utils.metrics import SummaryWriter, plot_alignment

__all__ = ["SummaryWriter", "plot_alignment"]
