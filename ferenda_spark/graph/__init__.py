"""Graph algorithms over the triple table: connected components for
owl:sameAs canonicalization, bounded transitive closure for
dcterms:isPartOf*."""
