from .tokens import apply_token_transform, transform_expr, TRANSFORMS

__all__ = ["apply_token_transform", "transform_expr", "TRANSFORMS"]
