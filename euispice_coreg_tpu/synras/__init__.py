from .map_builder import ComposedMapBuilder, MapBuilder, SPICEComposedMapBuilder  # noqa: F401
