"""Model definitions: the reference's Olist pipeline + TPC-H analogues."""
