from terminus_server_spark.model.triples import TripleStore, triples_from_table

__all__ = ["TripleStore", "triples_from_table"]
