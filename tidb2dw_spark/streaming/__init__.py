from .consumer import IncrementConsumer, ConsumerReport

__all__ = ["IncrementConsumer", "ConsumerReport"]
