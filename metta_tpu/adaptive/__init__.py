from metta_tpu.adaptive.controller import AdaptiveController, Dispatcher, LocalDispatcher

__all__ = ["AdaptiveController", "Dispatcher", "LocalDispatcher"]
