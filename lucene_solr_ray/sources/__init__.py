from .loaders import URP_REGISTRY, apply_chain, read_csv_docs, read_json_docs, read_xml_docs

__all__ = ["URP_REGISTRY", "apply_chain", "read_csv_docs", "read_json_docs", "read_xml_docs"]
