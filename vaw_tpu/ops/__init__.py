from .attention import multi_head_attention

__all__ = ["multi_head_attention"]
